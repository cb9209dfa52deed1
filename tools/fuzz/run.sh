#!/bin/sh
# ASan/UBSan fuzz of the native codec cores (untrusted-input parsers).
# Corpus: the python block below writes fresh valid JPEGs to /tmp.
# Expect "garbage pass done" / "lzw ok" / "unfilter ok" and no
# sanitizer reports. Found 9 real bounds/UB bugs in jpeg_core on its
# first run (fixed in "Harden JPEG decoder against malformed streams").
set -e
cd "$(dirname "$0")/../.."
python - <<'PY'
import sys, io, numpy as np
sys.path.insert(0, '.')
from zignal_tpu.codecs import jpeg
from PIL import Image
rng = np.random.default_rng(2)
img = np.clip(rng.normal(128, 50, (120, 160, 3)), 0, 255).astype(np.uint8)
open('/tmp/fz1.jpg','wb').write(jpeg.encode(img, quality=90, subsampling='420'))
open('/tmp/fz2.jpg','wb').write(jpeg.encode(img, quality=40, subsampling='444'))
open('/tmp/fz3.jpg','wb').write(jpeg.encode(img[...,:1], quality=85))
b = io.BytesIO(); Image.fromarray(img).save(b, 'JPEG', quality=85, progressive=True); open('/tmp/fz4.jpg','wb').write(b.getvalue())
b = io.BytesIO(); Image.fromarray(img).save(b, 'JPEG', quality=85, restart_marker_blocks=2); open('/tmp/fz5.jpg','wb').write(b.getvalue())
PY
g++ -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all -std=c++17 \
    -o /tmp/fuzz_jpeg tools/fuzz/fuzz_jpeg.cpp zignal_tpu/native/jpeg_core.cpp
g++ -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all -std=c++17 \
    -o /tmp/fuzz_codec tools/fuzz/fuzz_codec.cpp zignal_tpu/native/codec_core.cpp zignal_tpu/native/jpeg_core.cpp
/tmp/fuzz_jpeg /tmp/fz1.jpg /tmp/fz2.jpg /tmp/fz3.jpg /tmp/fz4.jpg /tmp/fz5.jpg
/tmp/fuzz_codec
