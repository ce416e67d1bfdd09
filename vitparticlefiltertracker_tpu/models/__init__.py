from vitparticlefiltertracker_tpu.models.vit import (
    VitSpec,
    init_vit_params,
    vit_embed,
    vit_forward_tokens,
)

__all__ = ["VitSpec", "init_vit_params", "vit_embed", "vit_forward_tokens"]
