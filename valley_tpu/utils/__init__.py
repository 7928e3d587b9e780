from valley_tpu.utils.logging import (build_logger, disable_progress,
                                      print_trainable_params,
                                      rank_zero_info)
