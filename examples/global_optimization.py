"""Global optimization (reference: examples/src/global_optimization.zig)."""

import math

from _common import zignal


def main():
    # Himmelblau's function has four global minima at value 0
    def himmelblau(v):
        x, y = v
        return (x * x + y - 11) ** 2 + (x + y * y - 7) ** 2

    x, y = zignal.optimize(himmelblau, bounds=[(-5, 5), (-5, 5)],
                           max_evals=400, seed=3)
    print(f"himmelblau minimum near ({x[0]:.3f}, {x[1]:.3f}) value {y:.5f}")

    # ask-tell with a BATCHED objective: propose 8 candidates per round
    # and evaluate them in ONE vectorized call (the TPU-native analogue
    # of the reference's concurrent evaluation pool,
    # global_search.zig:276-341 — here via numpy; jax.vmap works the
    # same way for device-evaluated objectives)
    import numpy as np

    def himmelblau_batch(X):  # [k, 2] -> [k]
        x, y = X[:, 0], X[:, 1]
        return (x * x + y - 11) ** 2 + (x + y * y - 7) ** 2

    opt = zignal.GlobalOptimizer([(-5, 5), (-5, 5)], seed=3)
    for _ in range(50):
        X = opt.ask(8)
        opt.tell(X, himmelblau_batch(np.asarray(X)))
    bx, by = opt.best()
    print(f"batched ask-tell minimum near ({bx[0]:.3f}, {bx[1]:.3f}) "
          f"value {by:.5f} after {opt.num_evaluations} evals")
    assert by < 1e-3  # converges to one of the four global minima

    # assignment problem
    costs = zignal.Matrix([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    result = zignal.solve_assignment_problem(costs)
    print("assignment:", result)


if __name__ == "__main__":
    main()
