from .step import step_args_from_finality_update
from .rotation import rotation_args_from_update
