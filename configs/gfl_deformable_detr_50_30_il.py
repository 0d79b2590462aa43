"""DSKD 50+30 split (chaosuan_gfl_deformable_detr_50_*_il.py)."""
from dskd_tpu.utils.config import dskd_flagship_config


def get_config():
    return dskd_flagship_config(catsplit=(50, 30),
                                work_dir="work_dirs/gfl_ddetr_50_30_il")
