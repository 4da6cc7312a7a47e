from .step import SyncStepArgs, sync_step_instances
from .rotation import CommitteeUpdateArgs, committee_update_instances
