import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
sys.path.insert(0, "/root/repo")
from libjxl_tpu.api import codestream, tpu_codec

sys.path.insert(0, "/root/repo/tests")
from test_ans_kernel import _image

datas = [codestream.encode_lossy(_image(512, s), distance=4.0, effort=3)
         for s in (7, 8)]
imgs, info = tpu_codec.decode_tpu_batch_entropy(datas)
print("path:", info)
ref = tpu_codec.decode_tpu_batch(datas)
for i, (a, b) in enumerate(zip(imgs, ref)):
    d = a.astype(int) - b.astype(int)
    nz = np.nonzero(d)
    print(f"img {i}: ndiff={len(nz[0])} maxabs={np.abs(d).max()}")
    if len(nz[0]):
        ys, xs, cs = nz
        print("  first diffs (y,x,c,got,ref):")
        for k in range(min(6, len(ys))):
            y, x, c = ys[k], xs[k], cs[k]
            print(f"   {y},{x},{c}: {a[y,x,c]} vs {b[y,x,c]}")
        print("  y range", ys.min(), ys.max(), "x range", xs.min(),
              xs.max())
