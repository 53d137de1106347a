from hpddm_tpu.core.csr import MatrixCSR
from hpddm_tpu.core.formats import BatchedDIA, BatchedELL, BatchedDense, pack_local_matrices

__all__ = ["MatrixCSR", "BatchedDIA", "BatchedELL", "BatchedDense", "pack_local_matrices"]
