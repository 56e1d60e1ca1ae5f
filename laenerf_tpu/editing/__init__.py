from .editgrid import EditGrid, EDIT_GRIDSIZE, voxelize_points, cell_world_pos
from .laenerf import (LAENeRFConfig, laenerf_init, laenerf_forward_train,
                      laenerf_weights, prune_palette, LAENeRFLosses)
from .edit_dataset import EditDataset
from .style import StyleNetwork, match_color, gram_matrices
from .style_trainer import LAENeRFTrainer, StyleLossWeights, laenerf_train_step
from .distill import distill_dataset
from .semantic import SemanticEncoder, nnfm_loss
from .npr_dataset import SingleViewEditDataset
from .npr_trainer import NPRTrainer, npr_train_step, build_npr_nerf_dataset
