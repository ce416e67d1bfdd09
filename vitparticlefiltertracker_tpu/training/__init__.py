"""Feature training subsystem: learn ViT appearance features in-repo.

The reference sells its ViT as "state-of-the-art deep learning techniques
for superior feature extraction" (/root/reference/README.md:7) but ships no
weights (SURVEY.md §0). This package trains them from scratch, TPU-first:

  * data.py      — procedural scene-pair generator, entirely ON DEVICE
                   (zero host involvement per step; the host has 1 core)
  * objective.py — localization InfoNCE through models/embedder.py, the
                   EXACT dense inference path (no train/serve skew)
  * train.py     — jitted optax train loop, donated state, versioned
                   checkpoints via models/params.py

Run via `python main.py train --config ...` (config section `train:`).
"""

from vitparticlefiltertracker_tpu.training.data import SceneBatch, make_pair_batch
from vitparticlefiltertracker_tpu.training.train import train_features

__all__ = ["SceneBatch", "make_pair_batch", "train_features"]
