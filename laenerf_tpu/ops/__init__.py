from .activation import trunc_exp
from .sh import sh_encode, sh_output_dim
from .freq import freq_encode, freq_output_dim
from .morton import morton3d, morton3d_invert, packbits, unpackbits
from .hashgrid import HashGridSpec, hashgrid_init, hashgrid_encode
from .raymarch import (
    near_far_from_aabb,
    sph_from_ray,
    march_rays_train,
    MarchConfig,
)
from .composite import composite_rays_train, composite_chunk
from .compaction import compact_samples, scatter_back
