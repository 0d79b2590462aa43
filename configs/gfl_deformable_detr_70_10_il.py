"""DSKD 70+10 split. NOTE: the reference's chaosuan 70 config carries a
stale (40,40) catsplit (SURVEY §7 quirks); here the split is the intended
(70, 10)."""
from dskd_tpu.utils.config import dskd_flagship_config


def get_config():
    return dskd_flagship_config(catsplit=(70, 10),
                                work_dir="work_dirs/gfl_ddetr_70_10_il")
