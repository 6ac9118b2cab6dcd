from ark_tpu.sample.samplers import make_sampler, generate, decode_latent
from ark_tpu.sample.beam import beam_generate, beam_generate_per_row

__all__ = ["make_sampler", "generate", "decode_latent", "beam_generate",
           "beam_generate_per_row"]
