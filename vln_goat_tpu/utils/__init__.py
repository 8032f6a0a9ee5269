from .logger import RunningMeter, Timer, MetricsLogger, write_to_record_file
from .misc import set_seed
