"""`zignal version` (reference: src/cli/version.zig)."""

description = "Print the zignal version."


def configure(parser):
    pass


def run(args):
    from .. import __version__

    print(f"zignal {__version__} (zignal-tpu)")
    return 0
