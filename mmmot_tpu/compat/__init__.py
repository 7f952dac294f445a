from mmmot_tpu.compat.torch_convert import (convert_conv_weight,
                                            convert_linear_weight,
                                            convert_bn, load_torch_checkpoint,
                                            torch_to_flax)
