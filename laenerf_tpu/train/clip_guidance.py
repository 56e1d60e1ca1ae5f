"""CLIP text-image guidance (train without GT images).

Equivalent of the reference's nerf/clip_utils.py (CLIP ViT-B/16 text-image
similarity loss, hooked into training via --rand_pose/--clip_text,
nerf/utils.py:464-468,543-557). The reference's flow renders a random-pose
low-res image and maximizes CLIP similarity with the text prompt.

The BACKPROP path is native: models/clip_vit.py is a JAX ViT-B/16 vision
tower, and Trainer.train_one_batch_clip / train_step_clip backprop
-(image_z . text_z) into NeRF params exactly like utils.py:543-557 —
vision weights load from a local npz (LAENERF_CLIP_NPZ). The TEXT
embedding is computed once per prompt; text_embedding() below uses a
locally cached HuggingFace CLIP (set LAENERF_CLIP_PATH) since prompts are
encoded host-side a single time. This module's CLIPLoss remains the
host-side torch scorer for monitoring/selection. The orbit-pose sampler
that feeds rand-pose training is data/provider.py (rand_poses).
"""

import os

import numpy as np


def text_embedding(text: str, model_path: str = None) -> np.ndarray:
    """Normalized [512] CLIP text embedding for a prompt, via the locally
    cached HF model (one-time, host-side; gated like CLIPLoss). Feed the
    result to Trainer.train_one_batch_clip for on-TPU backprop guidance."""
    scorer = CLIPLoss(text, model_path=model_path)
    return scorer.text_z.detach().numpy().reshape(-1)


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
        [0, 1]. Host-side scoring (CLIP runs on CPU torch) for
        monitoring/selection; the BACKPROP path is the JAX tower in
        models/clip_vit.py via Trainer.train_one_batch_clip."""
        torch = self._torch
        with torch.no_grad():
            inp = self.processor(
                images=(np.clip(image_hw3, 0, 1) * 255).astype(np.uint8),
                return_tensors="pt",
            )
            img_z = self.model.get_image_features(**inp)
            img_z = img_z / img_z.norm(dim=-1, keepdim=True)
            return float(-(img_z * self.text_z).sum())
