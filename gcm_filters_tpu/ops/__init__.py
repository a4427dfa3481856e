"""Discrete Laplacian operators as stateless pytree stencils."""

from .stencil import (
    ScalarStencil5,
    BGridVectorStencil,
    CGridVectorOperator,
    north_neighbor,
)
from .laplacians import build_operator, build_scalar_stencil, build_vector_operator
from .custom import BaseScalarOperator, BaseVectorOperator

__all__ = [
    "ScalarStencil5",
    "BGridVectorStencil",
    "CGridVectorOperator",
    "north_neighbor",
    "build_operator",
    "build_scalar_stencil",
    "build_vector_operator",
    "BaseScalarOperator",
    "BaseVectorOperator",
]
