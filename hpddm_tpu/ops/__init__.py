from hpddm_tpu.ops.spmv import spmm, spmm_dia, spmm_ell, spmm_dense
from hpddm_tpu.ops.local_solve import LocalSolver

__all__ = ["spmm", "spmm_dia", "spmm_ell", "spmm_dense", "LocalSolver"]
