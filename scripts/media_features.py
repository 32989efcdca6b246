#!/usr/bin/env python
"""spark-submit entry point: extract media features from WARC archives.

  python scripts/media_features.py --warc /path/to/warcdir --out /path/out
      [--every-n 10] [--fake]

Reads crawl archives, sniffs media response bodies into the multimodal
asset table (sources/warc.warc_media_assets), and writes three parquet
outputs under --out:
  image_features/   (asset_id, width, height, channels, features)
  audio_features/   (asset_id, sample_rate, n_samples, features)
  frames/           (asset_id, frame_idx, frame) — sampled video frames
  container_metadata/  (asset_id, format, duration_s, detail) for
                    MP4/MPEG-audio assets, whose frame decode has no
                    pure-Python codec — metadata instead of a crash

``--fake`` switches the decoders to the deterministic fake path for
formats without a pure-Python codec (strict mode raises on those).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc", required=True, help="WARC archive dir")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument("--every-n", type=int, default=10,
                    help="sample every Nth video frame")
    ap.add_argument("--fake", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from google_like_search_engine_spark.analytics.multimodal import (
        audio_features,
        image_features,
        media_metadata,
        sample_frames,
    )
    from google_like_search_engine_spark.session import get_spark
    from google_like_search_engine_spark.sources.warc import warc_media_assets

    spark = get_spark("media_features")
    t0 = time.perf_counter()
    assets = warc_media_assets(spark, args.warc).persist()
    counts = {
        r["kind"]: r["n"]
        for r in assets.groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # container-only formats (MP4 / MPEG audio): metadata, not decode —
    # strict-mode feature extraction on them would raise by design
    from google_like_search_engine_spark.analytics.multimodal import (
        isobmff_magic,
        mpeg_audio_magic,
    )

    b = F.col("payload")
    is_container = isobmff_magic(b) | mpeg_audio_magic(b)
    decodable = assets.where(~is_container)
    container = assets.where(is_container)
    media_metadata(container).write.mode("overwrite").parquet(
        f"{args.out}/container_metadata"
    )
    image_features(decodable, fake=args.fake).write.mode("overwrite").parquet(
        f"{args.out}/image_features"
    )
    audio_features(decodable, fake=args.fake).write.mode("overwrite").parquet(
        f"{args.out}/audio_features"
    )
    sample_frames(decodable, every_n=args.every_n, fake=args.fake).write.mode(
        "overwrite"
    ).parquet(f"{args.out}/frames")
    assets.unpersist()
    dt = time.perf_counter() - t0
    print(f"media features written to {args.out} in {dt:.1f}s "
          f"(assets by kind: {counts})")
    spark.stop()


if __name__ == "__main__":
    main()
