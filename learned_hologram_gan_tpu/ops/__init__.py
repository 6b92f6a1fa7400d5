"""Physics / numerical ops: the ASM propagator and its mask factories."""

from . import asm
from . import masks
from .asm import PropagatorPlan, make_plan

__all__ = ["asm", "masks", "PropagatorPlan", "make_plan"]
