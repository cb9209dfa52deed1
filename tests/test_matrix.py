"""Matrix tests (ported from bindings/python/tests/test_matrix.py)."""

import numpy as np
import pytest

import zignal_tpu as zignal


def test_matrix_construction_and_attrs():
    mat = zignal.Matrix.full(2, 3, fill_value=1.5)
    assert (mat.rows, mat.cols) == (2, 3)
    assert mat.shape == (2, 3)
    assert mat.dtype == "float64"


def test_matrix_indexing_and_assignment():
    mat = zignal.Matrix.full(2, 2, fill_value=0.0)
    mat[0, 1] = 4.2
    assert mat[0, 1] == pytest.approx(4.2)
    with pytest.raises(IndexError):
        _ = mat[2, 0]
    with pytest.raises(TypeError):
        _ = mat[0]


def test_numpy_roundtrip_and_validation():
    arr = np.ones((2, 3), dtype=np.float64)
    mat = zignal.Matrix.from_numpy(arr)
    assert np.array_equal(arr, mat.to_numpy())
    with pytest.raises(TypeError):
        zignal.Matrix.from_numpy(np.ones((2, 3), dtype=np.int32))
    with pytest.raises(ValueError):
        zignal.Matrix.from_numpy(np.ones((2,), dtype=np.float64))


def test_operators():
    a = zignal.Matrix([[1, 2], [3, 4]])
    b = zignal.Matrix([[5, 6], [7, 8]])
    assert isinstance(a + b, zignal.Matrix)
    assert isinstance(a - b, zignal.Matrix)
    assert isinstance(a * b, zignal.Matrix)
    assert isinstance(a @ b, zignal.Matrix)
    assert isinstance(a + 10, zignal.Matrix)
    assert isinstance(a * 2, zignal.Matrix)
    assert isinstance(2 * a, zignal.Matrix)
    assert isinstance(a / 2, zignal.Matrix)
    assert isinstance(-a, zignal.Matrix)
    assert np.allclose((a @ b).to_numpy(), a.to_numpy() @ b.to_numpy())


def test_scalar_subtraction():
    m = zignal.Matrix([[2.0]])
    assert (m - 10)[0, 0] == pytest.approx(-8.0)
    assert (10 - m)[0, 0] == pytest.approx(8.0)
    m2 = zignal.Matrix([[1, 2], [3, 4]])
    r = 10 - m2
    assert [r[0, 0], r[0, 1], r[1, 0], r[1, 1]] == [9.0, 8.0, 7.0, 6.0]


def test_creation_methods():
    assert zignal.Matrix.zeros(2, 3).shape == (2, 3)
    assert zignal.Matrix.ones(3, 2).shape == (3, 2)
    assert zignal.Matrix.identity(4, 4).shape == (4, 4)
    assert zignal.Matrix.random(2, 3, 0).shape == (2, 3)
    assert zignal.Matrix.random(2, 2, seed=42).shape == (2, 2)


def test_transpose_and_properties():
    m = zignal.Matrix([[1, 2, 3], [4, 5, 6]])
    assert m.transpose().shape == (3, 2)
    assert m.T.shape == (3, 2)


def test_statistics_methods():
    m = zignal.Matrix([[1, 2], [3, 4]])
    assert m.sum() == 10.0
    assert m.mean() == 2.5
    assert m.min() == 1.0
    assert m.max() == 4.0
    assert m.trace() == 5.0
    assert isinstance(m.variance(), float)
    assert isinstance(m.std(), float)


def test_linear_algebra_methods():
    m = zignal.Matrix([[2, 0], [0, 3]])
    assert m.det() == pytest.approx(6.0)
    a = zignal.Matrix([[1, 2], [3, 4], [5, 6]])
    assert a.gram().shape == (3, 3)
    assert a.covariance().shape == (2, 2)
    assert isinstance(m.frobenius_norm(), float)
    assert isinstance(m.l1_norm(), float)
    assert isinstance(m.max_norm(), float)
    assert isinstance(m.element_norm(), float)
    assert isinstance(m.element_norm(p=3.5), float)
    assert isinstance(m.schatten_norm(), float)
    assert isinstance(m.schatten_norm(p=1), float)
    assert isinstance(m.induced_norm(), float)
    assert isinstance(m.induced_norm(p=1), float)
    assert isinstance(m.nuclear_norm(), float)
    assert isinstance(m.spectral_norm(), float)
    with pytest.raises(ValueError):
        m.element_norm(p=-1)
    with pytest.raises(ValueError):
        m.schatten_norm(p=0.5)
    with pytest.raises(ValueError):
        m.induced_norm(p=3)


def test_extraction_methods():
    m = zignal.Matrix([[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    assert m.row(1).shape == (1, 3)
    assert m.col(2).shape == (3, 1)
    assert m.submatrix(0, 1, 2, 2).shape == (2, 2)


def test_rank_and_pinv():
    m = zignal.Matrix([[1, 0], [0, 1]])
    assert m.rank() == 2
    a = zignal.Matrix([[1, 2], [3, 4], [5, 6]])
    assert a.pinv().shape == (2, 3)


def test_lu_decomposition():
    m = zignal.Matrix([[4, 3], [6, 3]])
    result = m.lu()
    assert set(result.keys()) == {"l", "u", "p", "sign"}
    l, u, p = result["l"].to_numpy(), result["u"].to_numpy(), result["p"]
    perm_m = np.eye(2)[p]
    assert np.allclose(l @ u, perm_m @ m.to_numpy())


def test_qr_decomposition():
    m = zignal.Matrix([[1, 2], [3, 4], [5, 6]])
    result = m.qr()
    assert set(result.keys()) == {"q", "r", "rank", "perm", "col_norms"}
    q, r, perm = result["q"].to_numpy(), result["r"].to_numpy(), result["perm"]
    assert result["rank"] == 2
    assert np.allclose(q @ r, m.to_numpy()[:, perm])
    assert np.allclose(q.T @ q, np.eye(3), atol=1e-12)


def test_svd_decomposition():
    m = zignal.Matrix([[1, 2], [3, 4], [5, 6]])
    result = m.svd()
    assert set(result.keys()) == {"u", "s", "v", "converged"}
    u = result["u"].to_numpy()
    s = result["s"].to_numpy().ravel()
    v = result["v"].to_numpy()
    assert np.allclose(u[:, :2] @ np.diag(s) @ v.T, m.to_numpy())
    skinny = m.svd(full_matrices=False)
    assert skinny["u"].shape[1] <= result["u"].shape[1]
    assert isinstance(m.svd(compute_uv=False), dict)


def test_inplace_operators():
    a = zignal.Matrix([[1, 2], [3, 4]])
    a_np = np.array([[1.0, 2.0], [3.0, 4.0]])
    a += 10
    a_np += 10
    assert np.allclose(a.to_numpy(), a_np)
    a -= 2
    a_np -= 2
    a *= 2
    a_np *= 2
    a /= 2
    a_np /= 2
    assert np.allclose(a.to_numpy(), a_np)


def test_sum_rows_cols():
    m = zignal.Matrix([[1, 2, 3], [4, 5, 6]])
    rs = m.sum_rows()
    assert rs.shape == (1, 3)
    assert [rs[0, i] for i in range(3)] == [5.0, 7.0, 9.0]
    cs = m.sum_cols()
    assert cs.shape == (2, 1)
    assert [cs[0, 0], cs[1, 0]] == [6.0, 15.0]


def test_solve():
    a = zignal.Matrix([[2, 1, 1], [4, 3, 3], [8, 7, 9]])
    b = zignal.Matrix([[7], [19], [49]])
    x = a.solve(b)
    np.testing.assert_allclose(
        x.to_numpy(), np.linalg.solve(a.to_numpy(), b.to_numpy()), atol=1e-10
    )
    identity = zignal.Matrix.identity(3, 3)
    inv = a.solve(identity)
    np.testing.assert_allclose(inv.to_numpy(), np.linalg.inv(a.to_numpy()), atol=1e-10)


def test_solve_errors():
    singular = zignal.Matrix([[1, 2], [2, 4]])
    with pytest.raises(ValueError):
        singular.solve(zignal.Matrix([[1], [2]]))
    non_square = zignal.Matrix([[1, 2, 3], [4, 5, 6]])
    with pytest.raises(ValueError):
        non_square.solve(zignal.Matrix([[1], [2]]))
    good = zignal.Matrix([[1, 2], [3, 4]])
    with pytest.raises(ValueError):
        good.solve(zignal.Matrix([[1], [2], [3]]))
    with pytest.raises(TypeError):
        good.solve([[1], [2]])


def test_basic_methods():
    """(reference: bindings test_matrix.py) basic methods return Matrix."""
    m = zignal.Matrix([[1, 2], [3, 4]])
    assert isinstance(m.copy(), zignal.Matrix)
    assert isinstance(m.inv(), zignal.Matrix)
    assert isinstance(m.dot(m), zignal.Matrix)


def test_element_wise_operations():
    """(reference: bindings test_matrix.py) element-wise pow."""
    m = zignal.Matrix([[2, 3], [4, 5]])
    result = m.pow(2)
    assert isinstance(result, zignal.Matrix)
    assert result.shape == (2, 2)
