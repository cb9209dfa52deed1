"""QR encode/decode tests; OpenCV is the independent oracle
(reference behavior: src/qrcode/ + bindings test_qrcode.py)."""

import numpy as np
import pytest

import zignal_tpu as zignal
from zignal_tpu.qrcode import (
    EcLevel, decode_image, encode_text, encode_to_matrix,
)
from zignal_tpu.qrcode.decoder import decode_matrix
from zignal_tpu.qrcode.galois import rs_decode, rs_encode

cv2 = pytest.importorskip("cv2")


def _render(mat, scale=8, border=32):
    img = np.where(np.kron(mat, np.ones((scale, scale), bool)), 0, 255)
    return np.pad(img.astype(np.uint8), border, constant_values=255)


class TestReedSolomon:
    def test_roundtrip_no_errors(self):
        data = bytes(range(20))
        ecc = rs_encode(data, 10)
        block = bytearray(data + ecc)
        assert rs_decode(block, 10) == 0
        assert bytes(block[:20]) == data

    def test_corrects_errors(self):
        data = bytes(range(30))
        ecc = rs_encode(data, 16)
        block = bytearray(data + ecc)
        block[3] ^= 0xA5
        block[17] ^= 0xFF
        block[40] ^= 0x42
        assert rs_decode(block, 16) == 3
        assert bytes(block[:30]) == data

    def test_too_many_errors(self):
        data = bytes(range(30))
        block = bytearray(data + rs_encode(data, 8))
        for i in range(6):
            block[i] ^= 0x77
        with pytest.raises(ValueError):
            rs_decode(block, 8)


@pytest.mark.parametrize("text,level", [
    ("HELLO WORLD", EcLevel.MEDIUM),
    ("12345678901234567890", EcLevel.HIGH),
    ("https://example.com/path?x=1&y=2 lower", EcLevel.QUARTILE),
    ("x" * 200, EcLevel.LOW),
])
def test_cv2_decodes_our_encoding(text, level):
    mat, ver, _ = encode_to_matrix(text, level)
    val, _, _ = cv2.QRCodeDetector().detectAndDecode(_render(mat))
    assert val == text, f"version {ver}"


@pytest.mark.parametrize("text", ["HELLO WORLD", "byte mode text 123", "0123456789"])
def test_we_decode_our_encoding(text):
    mat, ver, _ = encode_to_matrix(text, EcLevel.MEDIUM)
    results = decode_image(_render(mat))
    assert len(results) == 1
    assert results[0].text == text
    assert results[0].version == ver


def test_matrix_roundtrip_all_versions_sample():
    for ver in (1, 5, 10):
        text = "V" * (ver * 8)
        mat, got_ver, _ = encode_to_matrix(text, EcLevel.LOW, version=ver)
        res = decode_matrix(mat)
        assert res.text == text
        assert res.version == ver


def test_we_decode_cv2_encoding():
    enc = cv2.QRCodeEncoder_create()
    img = enc.encode("Hello from OpenCV 123")
    img = cv2.resize(img, None, fx=8, fy=8, interpolation=cv2.INTER_NEAREST)
    img = np.pad(img, 32, constant_values=255)
    results = decode_image(img)
    assert len(results) == 1
    assert results[0].text == "Hello from OpenCV 123"


def test_decode_survives_damage():
    mat, _, _ = encode_to_matrix("DAMAGE TEST", EcLevel.HIGH)
    img = _render(mat)
    center = img.shape[0] // 2
    img[center:center + 16, center:center + 16] = 0  # scribble over data area
    results = decode_image(img)
    assert results and results[0].text == "DAMAGE TEST"
    assert results[0].corrected_errors > 0


def test_encode_text_image_api():
    img = encode_text("API TEST", EcLevel.MEDIUM, module_size=4, quiet_zone=4)
    assert isinstance(img, zignal.Image)
    assert img.dtype is zignal.Gray
    results = decode_image(img)
    assert results and results[0].text == "API TEST"


def test_decode_empty_image():
    blank = zignal.Image(64, 64, 255, dtype=zignal.Gray)
    assert decode_image(blank) == []


def test_encode_too_long():
    with pytest.raises(ValueError):
        encode_to_matrix("y" * 8000, EcLevel.HIGH)


# ---------------------------------------------------------------------------
# Reference API-contract tests, ported verbatim
# (reference: bindings/python/tests/test_qrcode.py)
# ---------------------------------------------------------------------------


class TestQrCodeEncodeContract:
    def test_returns_square_grayscale_image(self):
        img = zignal.qrcode_encode("hello", module_size=2, quiet_zone=4)
        assert isinstance(img, zignal.Image)
        assert img.rows == img.cols
        assert img.rows == (21 + 8) * 2

    def test_forced_version_and_module_size(self):
        img = zignal.qrcode_encode("hi", version=5, module_size=1, quiet_zone=0)
        assert img.rows == 17 + 4 * 5

    def test_data_too_large(self):
        with pytest.raises(ValueError):
            zignal.qrcode_encode("A" * 8000)

    def test_invalid_version(self):
        with pytest.raises(ValueError):
            zignal.qrcode_encode("hi", version=41)

    def test_invalid_module_size(self):
        with pytest.raises(ValueError):
            zignal.qrcode_encode("hi", module_size=0)

    def test_rejects_non_string_data(self):
        with pytest.raises(TypeError):
            zignal.qrcode_encode(123)


class TestQrCodeDecodeContract:
    def test_roundtrip_text(self):
        text = "https://github.com/arrufat/zignal"
        img = zignal.qrcode_encode(text)
        result = zignal.qrcode_decode(img)
        assert result is not None
        assert result.text == text
        assert result.data == text.encode()
        assert result.version >= 1
        assert result.ec_level == zignal.EcLevel.MEDIUM
        assert result.corrected_errors == 0

    def test_roundtrip_binary(self):
        payload = bytes(range(256))
        img = zignal.qrcode_encode(payload, ec_level=zignal.EcLevel.LOW)
        result = zignal.qrcode_decode(img)
        assert result is not None
        assert result.data == payload

    def test_ec_level_roundtrip(self):
        for level in (zignal.EcLevel.LOW, zignal.EcLevel.MEDIUM,
                      zignal.EcLevel.QUARTILE, zignal.EcLevel.HIGH):
            img = zignal.qrcode_encode("ec level test", ec_level=level)
            result = zignal.qrcode_decode(img)
            assert result is not None
            assert result.ec_level == level

    def test_ec_level_accepts_int(self):
        img = zignal.qrcode_encode("int level", ec_level=int(zignal.EcLevel.HIGH))
        result = zignal.qrcode_decode(img)
        assert result is not None
        assert result.ec_level == zignal.EcLevel.HIGH

    def test_corners_present_and_ordered(self):
        module_size, quiet_zone = 4, 4
        img = zignal.qrcode_encode("corners", module_size=module_size,
                                   quiet_zone=quiet_zone)
        result = zignal.qrcode_decode(img)
        assert result is not None
        corners = result.corners
        assert corners is not None and len(corners) == 4
        x, y = corners[0]
        assert x == pytest.approx(quiet_zone * module_size, abs=module_size)
        assert y == pytest.approx(quiet_zone * module_size, abs=module_size)

    def test_decode_color_image(self):
        gray = zignal.qrcode_encode("color conversion")
        rgb = gray.convert(zignal.Rgb)
        result = zignal.qrcode_decode(rgb)
        assert result is not None
        assert result.text == "color conversion"

    def test_no_qr_code_returns_none(self):
        blank = zignal.Image(64, 64, 255, dtype=zignal.Gray)
        assert zignal.qrcode_decode(blank) is None

    def test_rejects_non_image(self):
        with pytest.raises(TypeError):
            zignal.qrcode_decode("not an image")

    def test_repr(self):
        result = zignal.qrcode_decode(zignal.qrcode_encode("repr"))
        assert result is not None
        assert "QrDecodeResult" in repr(result)


def test_decode_with_spurious_finder_candidate():
    """Data regions can emit false 1:1:3:1:1 finder hits; the detector
    must pick the consistent triple (regression: fuzz-found failure where
    a 4th candidate with a different module size broke ordering)."""
    content = '6Xc7wH~6Pw:NkX^YrsOOqzUl[t_WX<!0r`T$gWVHZ2YsH:#*`9_JCU[zZA8n#'
    res = zignal.qrcode_decode(
        zignal.qrcode_encode(content, ec_level=zignal.EcLevel.QUARTILE))
    assert res is not None and res.text == content


def test_decode_random_content_sweep():
    import numpy as np

    rng = np.random.default_rng(123)
    levels = (zignal.EcLevel.LOW, zignal.EcLevel.MEDIUM,
              zignal.EcLevel.QUARTILE, zignal.EcLevel.HIGH)
    for i in range(16):
        n = int(rng.integers(1, 200))
        content = "".join(chr(int(rng.integers(32, 127))) for _ in range(n))
        res = zignal.qrcode_decode(
            zignal.qrcode_encode(content, ec_level=levels[i % 4]))
        assert res is not None and res.text == content, (i, n)
