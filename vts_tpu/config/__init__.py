from .options import (
    BaseOptions,
    TrainOptions,
    TestOptions,
    Options,
    str2bool,
)

__all__ = ["BaseOptions", "TrainOptions", "TestOptions", "Options", "str2bool"]
