"""turingcodec_tpu — a TPU-native HEVC (H.265) video encoder/decoder framework.

A from-scratch re-design of the capabilities of the Turing codec
(reference: /root/reference, bbc/turingcodec) for TPU hardware:

- Entropy (CABAC) and bitstream layers run on the host (Python/C++),
  producing/consuming *decision tensors* — the TPU-native analogue of the
  reference's CodedData decision stream (reference turing/CodedData.h:37).
- All pixel DSP (transforms, quantization, intra/inter prediction,
  deblocking, SAO, SAD/SATD/SSD metrics) runs as batched JAX/XLA/Pallas
  ops over CTU tensors (reference havoc/ kernel library equivalent).
- Parallelism is expressed as jax.sharding over device meshes: wavefront
  rows become diagonal batches, concurrent frames become GOP shards
  (reference ThreadPool/TaskEncode* equivalents, SURVEY.md §2.7).
"""

import os as _os

# OpenBLAS worker threads spin-wait after every numpy call and steal a core
# from the native codec loops on small hosts; the codec does its own
# threading (OpenMP / wavefront rows), so pin BLAS to one thread unless the
# user overrides. Must happen before numpy first loads the BLAS library.
for _v in ("OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")

__version__ = "0.1.0"
