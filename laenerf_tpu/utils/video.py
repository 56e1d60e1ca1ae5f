"""Video writing with a PNG-sequence fallback (no ffmpeg in this env)."""

import os

try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    import imageio


def write_video(path, frames, fps=24):
    """Try mp4 via imageio; fall back to <path>_frames/*.png."""
    try:
        imageio.mimwrite(path, frames, fps=fps)
        return path
    except Exception:
        out_dir = os.path.splitext(path)[0] + "_frames"
        os.makedirs(out_dir, exist_ok=True)
        for i, f in enumerate(frames):
            imageio.imwrite(os.path.join(out_dir, f"{i:04d}.png"), f)
        return out_dir
