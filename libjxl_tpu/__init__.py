"""libjxl_tpu — a TPU-native JPEG XL (ISO/IEC 18181) codec framework.

A from-scratch reimplementation of the capabilities of libjxl
(reference: /root/reference, v0.12.0-dev) designed TPU-first:

- pixel math (DCT zoo, XYB, Gaborish/EPF restoration, quantization,
  chroma-from-luma, adaptive-quant heuristics, Butteraugli) runs as
  JAX/XLA/Pallas programs over the image's 256x256 group grid;
- the group grid is the shard axis: multi-chip scaling uses
  jax.sharding.Mesh + shard_map with ppermute halo exchanges where the
  reference used a fork-join thread pool (lib/jxl/base/data_parallel.h);
- bitstream/entropy assembly (rANS, prefix codes, headers, container)
  runs vectorized on host, per-group streams being embarrassingly
  parallel by format design.

Layer map mirrors SURVEY.md section 1:
  base/     L0 status & misc
  io/       L2-L3 bit I/O, field bundles, headers, TOC, container
  entropy/  L4 rANS + prefix + hybrid-uint + clustering
  ops/      L5 transforms & pixel math (JAX/Pallas)
  vardct/   L6a lossy frame codec
  modular/  L6b lossless codec
  render/   L7 decoder restoration pipeline
  parallel/ device-mesh sharding & halo exchange
  api/      L8 encoder/decoder state machines
  extras/   L9 external-format I/O
  tools/    L11 CLIs & benchmarks
"""

__version__ = "0.1.0"

# Persistent XLA/Mosaic compilation cache: the Pallas entropy kernel and
# the fused batch-decode programs take minutes to compile; caching makes
# that a one-time cost across processes. Env-var defaults so this works
# whether or not jax is imported yet (jax reads them at init).
import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/libjxl_tpu_jax"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
del _os
