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

    # assignment problem
    costs = zignal.Matrix([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    result = zignal.solve_assignment_problem(costs)
    print("assignment:", result)


if __name__ == "__main__":
    main()
