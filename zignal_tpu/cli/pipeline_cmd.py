"""`zignal pipeline` (reference: src/cli/pipeline.zig).

Applies an ordered list of steps from a .zon (or .json) recipe file;
each step's payload mirrors the matching CLI command's options."""

from __future__ import annotations

import argparse
import json

from .common import emit_display, log

description = "Apply a sequence of operations described by a .zon recipe file."


def configure(parser):
    parser.add_argument("recipe", help="Recipe file (.zon or .json)")
    parser.add_argument("input", nargs="?", help="Input image (overrides recipe)")
    parser.add_argument("-o", "--output",
                        help="Output file (overrides recipe .output)")
    parser.add_argument("-d", "--display", action="store_true")
    parser.add_argument("--width", type=int)
    parser.add_argument("--height", type=int)
    parser.add_argument("--protocol")


def _load_recipe(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    if path.endswith(".json"):
        return json.loads(text)
    from .zon import parse_zon

    recipe = parse_zon(text)
    if not isinstance(recipe, dict):
        raise ValueError("recipe must be a ZON struct with .input/.output/.steps")
    return recipe


def _apply_step(img, name: str, options: dict):
    from . import blur_cmd, edges_cmd, resize_cmd

    ns = argparse.Namespace(**{k.replace("-", "_"): v for k, v in options.items()})
    if name == "resize":
        rows, cols = resize_cmd.compute_target_dimensions(
            img.rows, img.cols, getattr(ns, "scale", None),
            getattr(ns, "width", None), getattr(ns, "height", None),
        )
        from .common import INTERPOLATION_NAMES

        method = INTERPOLATION_NAMES[getattr(ns, "filter", None) or "bilinear"]
        return img.resize((rows, cols), method)
    if name == "blur":
        defaults = dict(type="gaussian", radius=None, sigma=None, angle=None,
                        distance=None, center_x=0.5, center_y=0.5, strength=0.5)
        defaults.update(vars(ns))
        return blur_cmd.apply(img, argparse.Namespace(**defaults))
    if name == "edges":
        defaults = dict(filter="sobel", sigma=None, low=None, high=None,
                        window=None, nms=False)
        defaults.update(vars(ns))
        return edges_cmd.apply(img, argparse.Namespace(**defaults))
    raise ValueError(f"unknown pipeline step {name!r}")


def run(args):
    from ..image import Image

    recipe = _load_recipe(args.recipe)
    input_path = args.input or recipe.get("input")
    if not input_path:
        raise ValueError("no input image (recipe .input or positional)")
    output = args.output or recipe.get("output")

    img = Image.load(input_path)
    for i, step in enumerate(recipe.get("steps", [])):
        if not isinstance(step, dict) or len(step) != 1:
            raise ValueError(f"step {i} must be a single {{name: options}} struct")
        (name, options), = step.items()
        img = _apply_step(img, name, options or {})
        log.info("step %d: %s -> %dx%d", i + 1, name, img.cols, img.rows)
    if output:
        img.save(output)
    if args.display or not output:
        emit_display(img, args.protocol, args.width, args.height)
    return 0
