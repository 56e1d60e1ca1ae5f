from .cache import enable_compilation_cache
from .timers import PhaseTimer
