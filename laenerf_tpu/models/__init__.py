from .mlp import mlp_init, mlp_apply
from .nerf import NeRFConfig, nerf_init, nerf_forward, nerf_density, nerf_background
from .occupancy import OccupancyState, occupancy_init, update_occupancy, mark_untrained_grid
from .renderer import render_rays_train, render_rays_infer, RenderConfig
from .stratified import render_rays_stratified, sample_pdf
