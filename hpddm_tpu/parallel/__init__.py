from hpddm_tpu.parallel.decomposition import Decomposition
from hpddm_tpu.parallel.ops import (
    exchange, scaled_exchange, weighted_dot, weighted_norm_sq, psum_if,
)

__all__ = [
    "Decomposition", "exchange", "scaled_exchange",
    "weighted_dot", "weighted_norm_sq", "psum_if",
]
