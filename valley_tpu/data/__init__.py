from valley_tpu.data.dataset import (DataCollatorForSupervisedDataset,
                                     HybridDataset,
                                     make_video_supervised_data_module)
from valley_tpu.data.video import load_video
