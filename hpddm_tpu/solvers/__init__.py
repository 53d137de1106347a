from hpddm_tpu.solvers.krylov import solve
from hpddm_tpu.solvers.base import LinearOperator

__all__ = ["solve", "LinearOperator"]
