"""Dropout primitives for the training hot loop.

The reference applies ``F.dropout`` between every processor layer
(Models/BuckGNN.py:352,470,491); at the flagship shape ([~115k, 512] node
activations, 6 layers, forward + backward) the PRNG/mask traffic is a
first-order cost of the step.

Two implementations:

- :func:`dropout` — XLA path: one uint32 word per element compared against
  a uint32 threshold. Measured on a v5e this matches/beats
  ``jax.random.bernoulli`` (which converts the words to float first) and
  far outperforms byte-packed masks (uint8 bitcast/compare lowers to slow
  sub-word unpacking on TPU: +1.2 ms per [115k, 512] call).
- :mod:`buckgnn_tpu.ops.pallas_epilogue` — the performance path: dropout
  fused with the relu/skip epilogue in a Pallas kernel whose mask bits are
  generated *in VMEM* (``pltpu.prng_random_bits``) and regenerated in the
  backward pass, so no PRNG output or mask ever touches HBM.

The keep probability is quantized to ``thr/2^32`` (error < 2.4e-10); the
scale uses the *quantized* probability, so E[dropout(x)] == x holds
exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout_threshold(rate: float, bits: int = 32) -> int:
    """Unsigned ``bits``-wide threshold for a keep probability of
    ``1 - rate``.

    ``bits`` < 32 quantizes the keep probability to ``thr / 2**bits``
    (the fused kernels slice several sub-word thresholds out of each
    hardware PRNG word — see pallas_sage_layer.DROPOUT_BITS); the scale
    below uses the *quantized* probability so E[dropout(x)] == x stays
    exact at any width. At 8 bits the realized rate deviates from the
    nominal one by at most 1/256 (e.g. 0.1016 for rate=0.1).
    """
    thr = int(round((1.0 - rate) * 2.0**bits))
    return max(1, min(2**bits - 1, thr))


def dropout_scale(rate: float, bits: int = 32) -> float:
    """Exact inverse of the quantized keep probability."""
    return 2.0**bits / dropout_threshold(rate, bits)


def dropout(x: jnp.ndarray, key: jax.Array, rate: float) -> jnp.ndarray:
    """Inverted dropout via uint32 threshold compare.

    Matches ``torch.nn.functional.dropout`` semantics (zero with
    probability ``rate``, scale survivors by ``1/keep``).
    """
    if rate <= 0.0:
        return x
    if rate >= 1.0:
        return jnp.zeros_like(x)
    thr = dropout_threshold(rate)
    words = jax.random.bits(key, x.shape, dtype=jnp.uint32)
    keep = words < jnp.uint32(thr)
    # scale in f32 like the fused Pallas kernels do: a bf16-rounded inverse
    # scale would bias E[dropout(x)] by up to ~0.4% and diverge from the
    # kernel path's values
    scaled = (x.astype(jnp.float32) * jnp.float32(dropout_scale(rate)))
    return jnp.where(keep, scaled.astype(x.dtype), jnp.zeros((), x.dtype))
