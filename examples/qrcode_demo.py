"""QR encode + decode roundtrip (reference: examples/src/qrcode.zig)."""

from _common import save
from zignal_tpu.qrcode import EcLevel, decode_image, encode_text


def main():
    text = "https://github.com/arrufat/zignal"
    img = encode_text(text, EcLevel.QUARTILE, module_size=6)
    save(img, "qrcode.png")
    results = decode_image(img)
    for r in results:
        print(f"decoded: {r.text!r} (version {r.version}, {r.ec_level.name})")


if __name__ == "__main__":
    main()
