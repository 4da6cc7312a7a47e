from .expression import Expr, Const, ColumnRef, Sum, Prod, Scaled, Challenge
from .cs import ConstraintSystem, Column, FIXED, ADVICE, INSTANCE
from .mock import MockProver
