"""VoxCeleb2 preparation: mp4 videos -> per-video frame-JPEG directories.

Parity with ``data_handling/prepare_voxceleb_dataset.py``: cv2
VideoCapture, keep every ``skip_frames``-th frame, BGR->RGB, resize to
``img_size``, one numbered subdirectory per video (the group/class
hierarchy consumed by ``ImgGIMDataSet(hierarchical=True)``).  Host-side
work — unchanged in spirit from the reference.
"""

from __future__ import annotations

import os
from typing import List

from optimalstrategiesagainstgenerativeattacks_tpu.data.utils import (
    list_dir,
    list_files_rec,
)


def vid_to_images(vid_path: str, img_size: int, skip_frames: int = 5) -> List:
    """Extract every skip_frames-th frame as a resized RGB PIL image."""
    import cv2
    from PIL import Image

    vidcap = cv2.VideoCapture(vid_path)
    images = []
    cnt = 0
    has_frame = True
    while has_frame:
        has_frame, frame = vidcap.read()
        if has_frame and cnt % skip_frames == 0:
            img = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            curr_img_size = img.shape[1]
            if curr_img_size >= img_size:
                pil = Image.fromarray(img).resize((img_size, img_size))
                images.append(pil)
            else:
                print(f"Warning: video {vid_path} is smaller then {img_size} pixels")
        cnt += 1
    vidcap.release()
    return images


def id_vids_to_imgs(id_src_root_dir: str, id_dst_root_dir: str, img_size: int,
                    skip_frames: int = 5) -> None:
    """All of an identity's videos -> one flat numbered image directory."""
    os.makedirs(id_dst_root_dir, exist_ok=True)
    id_images = []
    for vid_path in list_files_rec(id_src_root_dir, suffix=(".mp4",)):
        id_images.extend(vid_to_images(vid_path, img_size, skip_frames))
    for i, img in enumerate(id_images):
        img.save(os.path.join(id_dst_root_dir, f"{i:08}.jpg"))


def vids_to_id_imgs(id_src_root_dir: str, id_dst_root_dir: str, img_size: int,
                    skip_frames: int = 5) -> None:
    """One numbered subdir per video (the hierarchical layout the training
    dataset consumes)."""
    for vid_idx, vid_path in enumerate(list_files_rec(id_src_root_dir, suffix=(".mp4",))):
        vid_dst_dir = os.path.join(id_dst_root_dir, f"{vid_idx:04}")
        os.makedirs(vid_dst_dir, exist_ok=True)
        for img_idx, img in enumerate(vid_to_images(vid_path, img_size, skip_frames)):
            img.save(os.path.join(vid_dst_dir, f"{img_idx:08}.jpg"))


def id_largest_vid_to_imgs(id_src_root_dir: str, id_dst_root_dir: str, img_size: int,
                           skip_frames: int = 5) -> None:
    """Only the identity's longest video -> flat image directory."""
    os.makedirs(id_dst_root_dir, exist_ok=True)
    id_vid_images = [
        vid_to_images(vid_path, img_size, skip_frames)
        for vid_path in list_files_rec(id_src_root_dir, suffix=(".mp4",))
    ]
    id_images = max(id_vid_images, key=len)
    for i, img in enumerate(id_images):
        img.save(os.path.join(id_dst_root_dir, f"{i:08}.jpg"))


def create_dataset(src_vid_ds_root: str, dst_img_ds_root: str, img_size: int,
                   skip_frames: int = 5) -> None:
    """Walk identity dirs and convert each (``create_dataset:102-108``)."""
    for id_dir in list_dir(src_vid_ds_root):
        src_id_dir = os.path.join(src_vid_ds_root, id_dir)
        dst_id_dir = os.path.join(dst_img_ds_root, id_dir)
        print(f"Processing dir: {src_id_dir}")
        vids_to_id_imgs(src_id_dir, dst_id_dir, img_size, skip_frames)


def get_args():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--src_vid_ds_root", required=True,
                        help="path to voxceleb2 video directory at .../test/mp4/ or /dev/mp4")
    parser.add_argument("--dst_img_ds_root", required=True, help="location of new dataset")
    parser.add_argument("--img_size", type=int, default=64)
    parser.add_argument("--skip_frames", type=int, default=5)
    return parser.parse_args()


def main(args=None):
    args = args or get_args()
    create_dataset(
        src_vid_ds_root=args.src_vid_ds_root,
        dst_img_ds_root=args.dst_img_ds_root,
        img_size=args.img_size,
        skip_frames=args.skip_frames,
    )


if __name__ == "__main__":
    main()
