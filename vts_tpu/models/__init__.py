"""Model registry (reference models/__init__.py:25-67) — explicit, not
module-name reflection."""

from __future__ import annotations

from ..utils.registry import MODELS
from . import sinskit as _sinskit  # noqa: F401 — registers 'sinskit'/'sinskitG'

for _name in ("skit", "pix2pix", "pix2pixhd", "spade"):
    try:  # optional families register themselves when present
        __import__(f"vts_tpu.models.{_name}")
    except ImportError:
        pass


def get_option_setter(model_name: str):
    return MODELS.get(model_name).modify_commandline_options


def create_model(opt):
    cls = MODELS.get(opt.model)
    # --pool_size is only queried by pix2pixHD's D-fake pass (reference
    # pix2pixHD_model.py:582); everywhere else the reference silently ignores
    # it. Error instead of silently ignoring.
    if int(getattr(opt, "pool_size", 0)) > 0 and not getattr(
            cls, "supports_image_pool", False):
        raise ValueError(
            f"--pool_size > 0 is only wired into pix2pixHD (the reference's "
            f"sole ImagePool query site); model {opt.model!r} ignores it. "
            f"Pass --pool_size 0.")
    instance = cls(opt)
    print(f"model [{type(instance).__name__}] was created")
    return instance


def find_model_using_name(model_name: str):
    return MODELS.get(model_name)
