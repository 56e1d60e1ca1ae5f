"""Morton (Z-order) encoding and occupancy-bitfield packing.

TPU-native equivalents of the reference's raymarching extension utilities
(/root/reference/raymarching/src/raymarching.cu:57-82 morton3D/invert,
:268-300 packbits). Pure jnp bit-twiddling — vmappable, no kernel needed.

In this framework the hot marching path indexes an unpacked uint8 occupancy
grid of shape [CAS, H, H, H] directly (gathers beat bit-twiddling on the
VPU); morton order and the packed bitfield exist for (a) matching the
reference's density-grid storage layout, whose grid values are stored at
morton indices, and (b) compact serialization of edit grids.
"""

import jax.numpy as jnp


def _u32(x):
    return jnp.uint32(x)


def _expand_bits(v):
    """Spread the low 10 bits of v so there are 2 zeros between each bit."""
    v = (v * _u32(0x00010001)) & _u32(0xFF0000FF)
    v = (v * _u32(0x00000101)) & _u32(0x0F00F00F)
    v = (v * _u32(0x00000011)) & _u32(0xC30C30C3)
    v = (v * _u32(0x00000005)) & _u32(0x49249249)
    return v


def morton3d(coords):
    """Interleave 3D integer coords (each < 1024) into morton codes.

    Args:
      coords: [..., 3] int32 grid coordinates.
    Returns:
      [...] uint32 morton codes.
    """
    c = coords.astype(jnp.uint32)
    xx = _expand_bits(c[..., 0])
    yy = _expand_bits(c[..., 1])
    zz = _expand_bits(c[..., 2])
    return xx | (yy << 1) | (zz << 2)


def _compact_bits(x):
    x = x & _u32(0x49249249)
    x = (x | (x >> 2)) & _u32(0xC30C30C3)
    x = (x | (x >> 4)) & _u32(0x0F00F00F)
    x = (x | (x >> 8)) & _u32(0xFF0000FF)
    x = (x | (x >> 16)) & _u32(0x0000FFFF)
    return x


def morton3d_invert(codes):
    """Invert morton codes back to [..., 3] int32 coordinates."""
    c = codes.astype(jnp.uint32)
    x = _compact_bits(c)
    y = _compact_bits(c >> 1)
    z = _compact_bits(c >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def packbits(grid, thresh):
    """Pack a density grid into a bitfield, 8 cells per byte.

    Matches the reference's packbits kernel: bit i of byte b is set when
    grid[b*8 + i] > thresh.

    Args:
      grid: [..., N] float density values, N divisible by 8.
      thresh: scalar threshold.
    Returns:
      [..., N // 8] uint8 bitfield.
    """
    occ = (grid > thresh).astype(jnp.uint8)
    occ = occ.reshape(grid.shape[:-1] + (grid.shape[-1] // 8, 8))
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(occ << shifts, axis=-1).astype(jnp.uint8)


def unpackbits(bitfield):
    """Inverse of packbits: [..., N//8] uint8 -> [..., N] uint8 in {0,1}."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (bitfield[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(bitfield.shape[:-1] + (bitfield.shape[-1] * 8,))
