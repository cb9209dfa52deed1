"""Motion blur variants (reference: examples/src/motion_blur_demo.zig)."""

import math

from _common import load_input, save, zignal


def main():
    img = load_input(size=(256, 256))
    save(img.motion_blur(zignal.MotionBlur.linear(math.radians(30), 21)),
         "motion_linear.png")
    save(img.motion_blur(zignal.MotionBlur.radial_zoom(strength=0.6)),
         "motion_zoom.png")
    save(img.motion_blur(zignal.MotionBlur.radial_spin(strength=0.5)),
         "motion_spin.png")


if __name__ == "__main__":
    main()
