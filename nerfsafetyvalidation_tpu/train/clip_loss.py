"""CLIP-guided training loss for poses without GT images.

Parity target: reference nerf/clip_utils.py (`CLIPLoss`, :11-63): encode the
rendered image with a frozen CLIP image tower, maximize cosine similarity to
a prepared text embedding (negative-similarity loss). Requires the optional
openai `clip` package (+ torch); the hermetic TPU environment does not ship
it, so construction raises a clear ImportError and the trainer only builds
this when rand_pose >= 0 (utils.py:381-385 semantics).
"""

import random

import numpy as np

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


class CLIPLoss:
    def __init__(self, name: str = "ViT-B/16"):
        try:
            import clip
            import torch
        except ImportError as e:
            raise ImportError(
                "CLIPLoss requires the optional 'clip' + torch packages") from e
        self._clip = clip
        self._torch = torch
        self.name = name
        self.clip_model, _ = clip.load(name, device="cpu", jit=False)
        self.clip_model.eval()
        for p in self.clip_model.parameters():
            p.requires_grad = False
        self.text_zs = None

    def _normalize(self, x):
        return x / x.norm(dim=-1, keepdim=True)

    def prepare_text(self, texts):
        tokens = self._clip.tokenize(texts)
        self.text_zs = self._normalize(self.clip_model.encode_text(tokens))

    def __call__(self, images, mode: str = "text"):
        """images: [B, 3, H, W] float in [0, 1] (numpy or jax array).
        Returns a host float loss (CLIP runs on the host torch tower; the
        gradient-free guidance mode of the reference's hybrid training)."""
        torch = self._torch
        import torch.nn.functional as F
        x = torch.from_numpy(np.asarray(images)).float()
        x = F.interpolate(x, size=(224, 224), mode="bilinear",
                          align_corners=False)
        mean = torch.from_numpy(_CLIP_MEAN)[None, :, None, None]
        std = torch.from_numpy(_CLIP_STD)[None, :, None, None]
        x = (x - mean) / std
        image_zs = self._normalize(self.clip_model.encode_image(x))
        if mode != "text":
            raise NotImplementedError
        if self.text_zs.shape[0] > 1:
            idx = random.randint(0, self.text_zs.shape[0] - 1)
            text_zs = self.text_zs[[idx]]
        else:
            text_zs = self.text_zs
        return float(-(image_zs * text_zs).sum(-1).mean())
