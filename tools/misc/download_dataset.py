#!/usr/bin/env python
"""Download benchmark datasets (parity: tools/misc/download_dataset.py).

Fetches the official COCO / VOC / LVIS archives into --save-dir with a
thread pool, optionally unzipping. Uses urllib (no torch.hub dependency);
already-present files are skipped so interrupted runs resume. In
offline environments pass --print-urls and fetch out of band — every
other dskd_tpu tool consumes the standard extracted layout
(data/coco/annotations/..., data/VOCdevkit/...).
"""
import argparse
import shutil
import urllib.request
from itertools import repeat
from multiprocessing.pool import ThreadPool
from pathlib import Path
from tarfile import TarFile
from zipfile import ZipFile

DATA2URL = dict(
    coco2017=[
        "http://images.cocodataset.org/zips/train2017.zip",
        "http://images.cocodataset.org/zips/val2017.zip",
        "http://images.cocodataset.org/zips/test2017.zip",
        "http://images.cocodataset.org/annotations/"
        "annotations_trainval2017.zip",
    ],
    lvis=[
        "https://s3-us-west-2.amazonaws.com/dl.fbaipublicfiles.com/LVIS/"
        "lvis_v1_train.json.zip",
        "https://s3-us-west-2.amazonaws.com/dl.fbaipublicfiles.com/LVIS/"
        "lvis_v1_val.json.zip",
    ],
    voc2007=[
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/"
        "VOCtrainval_06-Nov-2007.tar",
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/"
        "VOCtest_06-Nov-2007.tar",
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/"
        "VOCdevkit_08-Jun-2007.tar",
    ],
    voc2012=[
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2012/"
        "VOCtrainval_11-May-2012.tar",
    ],
)


def download_one(url, dir, unzip=False, delete=False):
    f = dir / Path(url).name
    if Path(url).is_file():           # local path: move into place
        Path(url).rename(f)
    elif not f.exists():
        print(f"Downloading {url} to {f}")
        tmp = f.with_suffix(f.suffix + ".part")
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as out:
            shutil.copyfileobj(r, out)
        tmp.rename(f)
    if unzip and f.suffix in (".zip", ".tar"):
        print(f"Unzipping {f.name}")
        if f.suffix == ".zip":
            ZipFile(f).extractall(path=dir)
        else:
            TarFile(f).extractall(path=dir)
        if delete:
            f.unlink()
            print(f"Delete {f}")


def download(urls, dir, unzip=False, delete=False, threads=1):
    dir = Path(dir)
    if threads > 1:
        pool = ThreadPool(threads)
        pool.starmap(lambda u, d: download_one(u, d, unzip, delete),
                     zip(urls, repeat(dir)))
        pool.close()
        pool.join()
    else:
        for u in urls:
            download_one(u, dir, unzip, delete)


def main():
    parser = argparse.ArgumentParser(
        description="Download datasets for training")
    parser.add_argument("--dataset-name", default="coco2017",
                        choices=sorted(DATA2URL))
    parser.add_argument("--save-dir", default="data/coco")
    parser.add_argument("--unzip", action="store_true")
    parser.add_argument("--delete", action="store_true",
                        help="delete archives after unzipping")
    parser.add_argument("--threads", type=int, default=4)
    parser.add_argument("--print-urls", action="store_true",
                        help="print the URL list and exit (for offline "
                        "or mirrored fetches)")
    args = parser.parse_args()

    urls = DATA2URL[args.dataset_name]
    if args.print_urls:
        print("\n".join(urls))
        return
    path = Path(args.save_dir)
    path.mkdir(parents=True, exist_ok=True)
    download(urls, path, unzip=args.unzip, delete=args.delete,
             threads=args.threads)


if __name__ == "__main__":
    main()
