from .model import LTXVideo2, LTX2Config, LTX2Transformer
from .video_vae import LTX2VideoVAE, LTX2VideoVAEConfig, load_ltx2_video_vae
