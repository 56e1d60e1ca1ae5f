"""CLIP text-image guidance (train without GT images).

Equivalent of the reference's nerf/clip_utils.py (CLIP ViT-B/16 text-image
similarity loss, hooked into training via --rand_pose/--clip_text,
nerf/utils.py:464-468,543-557). The reference's flow renders a random-pose
low-res image and maximizes CLIP similarity with the text prompt.

CLIP weights cannot be downloaded here (zero egress); the loss is gated on
a locally cached HuggingFace CLIP model (set LAENERF_CLIP_PATH or have
openai/clip-vit-base-patch16 in the HF cache). The orbit-pose sampler that
feeds it is in data/provider.py (rand_poses).
"""

import os

import numpy as np


class CLIPLoss:
    """Text-image similarity loss; raises at construction if no local CLIP.

    Usage mirrors clip_utils.py:11-59: fix the text embedding once, then
    score rendered images.
    """

    def __init__(self, text: str, model_path: str = None):
        model_path = model_path or os.environ.get(
            "LAENERF_CLIP_PATH", "openai/clip-vit-base-patch16"
        )
        try:
            from transformers import (CLIPModel, CLIPProcessor)

            self.model = CLIPModel.from_pretrained(model_path,
                                                   local_files_only=True)
            self.processor = CLIPProcessor.from_pretrained(
                model_path, local_files_only=True
            )
        except Exception as e:  # pragma: no cover - depends on local cache
            raise RuntimeError(
                "CLIP guidance requires a locally cached CLIP model "
                "(set LAENERF_CLIP_PATH); this environment has no network "
                "egress to download one."
            ) from e
        import torch

        self._torch = torch
        with torch.no_grad():
            tok = self.processor(text=[text], return_tensors="pt",
                                 padding=True)
            self.text_z = self.model.get_text_features(**tok)
            self.text_z = self.text_z / self.text_z.norm(dim=-1, keepdim=True)

    def __call__(self, image_hw3: np.ndarray) -> float:
        """Negative cosine similarity for a rendered [H, W, 3] image in
        [0, 1]. Host-side scoring (CLIP runs on CPU torch); the gradient-free
        score is used for monitoring/selection rather than backprop — full
        backprop guidance would need a JAX CLIP port (future work)."""
        torch = self._torch
        with torch.no_grad():
            inp = self.processor(
                images=(np.clip(image_hw3, 0, 1) * 255).astype(np.uint8),
                return_tensors="pt",
            )
            img_z = self.model.get_image_features(**inp)
            img_z = img_z / img_z.norm(dim=-1, keepdim=True)
            return float(-(img_z * self.text_z).sum())
