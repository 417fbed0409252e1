from . import host
from .vesta import (
    PointBatch,
    add,
    double,
    eq,
    from_affine_host,
    identity,
    is_identity,
    neg,
    scalar_mul,
    select,
    to_affine_host,
)
from .msm import msm, scalar_digits

__all__ = [
    "host",
    "PointBatch",
    "add",
    "double",
    "eq",
    "from_affine_host",
    "identity",
    "is_identity",
    "neg",
    "scalar_mul",
    "select",
    "to_affine_host",
    "msm",
    "scalar_digits",
]
