from .builder import CircuitBuilder, Context, AssignedValue
from .range_chip import RangeChip
