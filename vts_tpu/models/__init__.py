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
    instance = cls(opt)
    print(f"model [{type(instance).__name__}] was created")
    return instance


def find_model_using_name(model_name: str):
    return MODELS.get(model_name)
