from .dcn import dcn_v2, bilinear_sample
