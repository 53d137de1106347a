from hpddm_tpu.models import diffusion2d, fromfile, nonoverlap

__all__ = ["diffusion2d", "fromfile", "nonoverlap", "helmholtz",
           "elasticity2d"]
