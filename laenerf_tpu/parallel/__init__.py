from .mesh import make_mesh, shard_batch, replicate, dp_train_step
from .render import dp_render_image
