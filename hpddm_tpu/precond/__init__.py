from hpddm_tpu.precond.schwarz import Schwarz, SchwarzState

__all__ = ["Schwarz", "SchwarzState"]
