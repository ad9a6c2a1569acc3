from atlas_tpu.utils.schedules import (
    IndexRefreshScheduler,
    lr_schedule,
    parse_index_refresh_schedule_string,
)
from atlas_tpu.utils.stats import WeightedAvgStats
