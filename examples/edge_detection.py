"""Sobel vs Canny vs Shen-Castan (reference: examples/src/edge_detection.zig)."""

from _common import load_input, save


def main():
    img = load_input(size=(256, 256))
    save(img.sobel(), "edges_sobel.png")
    save(img.canny(sigma=1.4, low=40, high=120), "edges_canny.png")
    save(img.shen_castan(), "edges_shen_castan.png")


if __name__ == "__main__":
    main()
