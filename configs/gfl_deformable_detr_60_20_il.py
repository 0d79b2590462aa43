"""DSKD 60+20 split (chaosuan_gfl_deformable_detr_60_*_il.py)."""
from dskd_tpu.utils.config import dskd_flagship_config


def get_config():
    return dskd_flagship_config(catsplit=(60, 20),
                                work_dir="work_dirs/gfl_ddetr_60_20_il")
