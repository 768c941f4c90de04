"""Batch scheduler for the video -> pseudo-label task matrix.

Reference surface: process_videos.sh (yt-dlp download + flock-based GPU
lease scheduler over 24 (method, skip, resize) tasks per video,
ref process_videos.sh:34-152). Downloading is out of scope in this
zero-egress build (`--video_dir` takes already-downloaded mp4s); the task
matrix and crash-resumable sequencing are preserved. On a TPU host tasks
run sequentially per chip (one XLA client owns the chip); multi-host fleets
shard the video list by --shard/--num_shards.
"""

from __future__ import annotations

import argparse
import itertools
import os
from os.path import join

DEFAULT_METHODS = ("root_sift", "gim_lightglue", "gim_loftr", "gim_dkm")
LOW_FPS_SKIPS = (10, 20, 40)    # fps <= 30 (ref process_videos.sh:108-124)
HIGH_FPS_SKIPS = (20, 40, 80)   # fps > 30


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", required=True)
    p.add_argument("--labels_root", default="data/walk_labels")
    p.add_argument("--methods", nargs="+", default=list(DEFAULT_METHODS))
    p.add_argument("--img_sizes", type=int, nargs="+", default=[840])
    p.add_argument("--no_resize_round", action="store_true",
                   help="drop the resize=T half of the 24-task matrix "
                        "(ref process_videos.sh:108-124)")
    p.add_argument("--ckpts", nargs="+", default=[],
                   help="method=path entries, e.g. gim_loftr=weights/x.ckpt")
    p.add_argument("--max_pairs", type=int, default=None)
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    args = p.parse_args(argv)

    from gim_tpu.cli.video_preprocessor import process_video
    from gim_tpu.data.video import VideoStreamer

    ckpts = dict(e.split("=", 1) for e in args.ckpts)
    videos = sorted(v for v in os.listdir(args.video_dir)
                    if v.endswith((".mp4", ".mkv", ".webm")))
    videos = videos[args.shard::args.num_shards]
    print(f"[scheduler] {len(videos)} videos, methods {args.methods}")

    for vid in videos:
        path = join(args.video_dir, vid)
        fps = VideoStreamer(path).fps
        skips = HIGH_FPS_SKIPS if fps > 30 else LOW_FPS_SKIPS
        resizes = (False,) if args.no_resize_round else (False, True)
        # full reference matrix: methods x skips x resize = 24 tasks/video
        # (ref process_videos.sh:108-124). All resize=False tasks run
        # first — the resize round crops around the gim_dkm rF matches
        # (ref video_preprocessor.py:206-212).
        tasks = [(m, s, r) for r in resizes
                 for m, s in itertools.product(args.methods, skips)]
        print(f"[scheduler] {vid}: fps {fps:.0f}, {len(tasks)} tasks")
        for method, skip, resize in tasks:
            try:
                process_video(path, args.labels_root, method, skip,
                              args.img_sizes[0], ckpts.get(method),
                              max_pairs=args.max_pairs, resize=resize)
            except Exception as e:  # resumable: log and continue the matrix
                print(f"[scheduler] task ({vid},{method},{skip},"
                      f"r{resize}) failed: {e}")


if __name__ == "__main__":
    main()
