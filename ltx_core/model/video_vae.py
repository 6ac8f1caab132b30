"""Video VAE re-exports (reference: ltx_core/model/video_vae/*)."""

from mlx_video_tpu.models.ltx.video_vae import ops
from mlx_video_tpu.models.ltx.video_vae.blocks import (
    depth_to_space_upsample,
    pixel_norm,
    resnet_block,
    space_to_depth_downsample,
)
from mlx_video_tpu.models.ltx.video_vae.conv import causal_conv3d
from mlx_video_tpu.models.ltx.video_vae.decoder import (
    DecoderConfig,
    init_video_decoder,
    video_decoder_apply,
)
from mlx_video_tpu.models.ltx.video_vae.encoder import (
    init_video_encoder,
    video_encoder_apply,
)
from mlx_video_tpu.models.ltx.video_vae.tiling import TilingConfig, decode_with_tiling
