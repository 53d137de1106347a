from hpddm_tpu.models import diffusion2d

__all__ = ["diffusion2d"]
