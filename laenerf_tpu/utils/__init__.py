from .cache import compile_cache_stats, enable_compilation_cache
from .timers import PhaseTimer
from .color import srgb_to_linear, linear_to_srgb
from .palette import palette_to_img, palette_change_to_img
from .video import write_video
from .plots import plot_losses
