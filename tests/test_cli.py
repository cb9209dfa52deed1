"""CLI tests: drive `zignal` commands through main() (reference: src/cli/)."""

import os

import numpy as np
import pytest

import zignal_tpu as zignal
from zignal_tpu.cli.main import main


@pytest.fixture
def sample(tmp_path):
    img = zignal.Image(32, 48, dtype=zignal.Rgb)
    a = img.to_numpy()
    a[...] = np.linspace(0, 255, a.size, dtype=np.uint8).reshape(a.shape)
    p = str(tmp_path / "sample.png")
    img.save(p)
    return p


def test_version(capsys):
    assert main(["version"]) == 0
    assert "zignal" in capsys.readouterr().out


def test_resize(sample, tmp_path, capsys):
    out = str(tmp_path / "out.png")
    assert main(["resize", sample, "--scale", "0.5", "-o", out]) == 0
    img = zignal.Image.load(out)
    assert (img.rows, img.cols) == (16, 24)
    out2 = str(tmp_path / "out2.png")
    assert main(["resize", sample, "--width", "24", "-o", out2]) == 0
    assert zignal.Image.load(out2).cols == 24


def test_resize_batch_incomplete(sample, tmp_path):
    outdir = str(tmp_path / "outdir") + os.sep
    rc = main(["resize", sample, str(tmp_path / "missing.png"),
               "--scale", "0.5", "-o", outdir])
    assert rc == 1  # one input failed -> non-zero, but first succeeded
    assert os.path.exists(os.path.join(outdir, "sample_resized.png"))


def test_info(sample, capsys):
    assert main(["info", sample, "--stats"]) == 0
    out = capsys.readouterr().out
    assert "PNG" in out and "48x32" in out and "mean=" in out


def test_blur_and_edges(sample, tmp_path):
    out = str(tmp_path / "b.png")
    assert main(["blur", sample, "--type", "gaussian", "--sigma", "2",
                 "-o", out]) == 0
    assert os.path.exists(out)
    out2 = str(tmp_path / "e.png")
    assert main(["edges", sample, "--filter", "canny", "-o", out2]) == 0
    assert zignal.Image.load(out2).dtype is zignal.Gray


def test_metrics_and_diff(sample, tmp_path, capsys):
    blurred = str(tmp_path / "blurred.png")
    main(["blur", sample, "--sigma", "1.5", "-o", blurred])
    assert main(["metrics", sample, blurred]) == 0
    out = capsys.readouterr().out
    assert "psnr:" in out and "ssim:" in out
    dout = str(tmp_path / "d.png")
    assert main(["diff", sample, blurred, "-o", dout]) == 0
    assert "max diff" in capsys.readouterr().out


def test_fdm(sample, tmp_path):
    target = str(tmp_path / "t.png")
    zignal.Image(32, 48, (200, 50, 100), dtype=zignal.Rgb).save(target)
    out = str(tmp_path / "f.png")
    assert main(["fdm", sample, target, out]) == 0
    assert os.path.exists(out)


def test_tile(sample, tmp_path):
    out = str(tmp_path / "tile.png")
    assert main(["tile", sample, sample, sample, sample, "-o", out]) == 0
    img = zignal.Image.load(out)
    assert (img.rows, img.cols) == (64, 96)


def test_pipeline_zon(sample, tmp_path):
    recipe = tmp_path / "recipe.zon"
    recipe.write_text("""
.{
    .steps = .{
        .{ .resize = .{ .scale = 0.5 } },
        .{ .blur = .{ .type = .gaussian, .sigma = 1.0 } },
        .{ .edges = .{ .filter = .sobel } },
    },
}
""")
    out = str(tmp_path / "p.png")
    assert main(["pipeline", str(recipe), sample, "-o", out]) == 0
    img = zignal.Image.load(out)
    assert (img.rows, img.cols) == (16, 24)
    assert img.dtype is zignal.Gray


def test_pipeline_json(sample, tmp_path):
    recipe = tmp_path / "recipe.json"
    recipe.write_text(
        '{"steps": [{"resize": {"width": 20, "height": 10}}]}'
    )
    out = str(tmp_path / "pj.png")
    assert main(["pipeline", str(recipe), sample, "-o", out]) == 0
    assert (zignal.Image.load(out).rows, zignal.Image.load(out).cols) == (10, 20)


def test_qr_roundtrip(tmp_path, capsys):
    out = str(tmp_path / "qr.png")
    assert main(["qr", "encode", "CLI ROUNDTRIP", "-o", out]) == 0
    capsys.readouterr()
    assert main(["qr", "decode", out]) == 0
    assert "CLI ROUNDTRIP" in capsys.readouterr().out


def test_display_sgr(sample, capsys):
    assert main(["display", sample, "--protocol", "sgr", "--width", "16"]) == 0
    assert "▀" in capsys.readouterr().out


def test_unknown_input_fails(tmp_path):
    assert main(["info", str(tmp_path / "nope.png")]) == 1
