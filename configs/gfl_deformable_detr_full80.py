"""Single-task full-COCO training (task-1 pretraining / non-IL baseline,
the reference's gfl_deformable_detr_r50 config family)."""
from dskd_tpu.utils.config import dskd_flagship_config


def get_config():
    cfg = dskd_flagship_config(catsplit=(80,),
                               work_dir="work_dirs/gfl_ddetr_full80")
    return cfg
