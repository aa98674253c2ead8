"""Zip the library for ``spark-submit --py-files``: dist/neuronews_spark.zip"""

from __future__ import annotations

import os
import shutil

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
dist = os.path.join(repo, "dist")
os.makedirs(dist, exist_ok=True)
out = shutil.make_archive(
    os.path.join(dist, "neuronews_spark"), "zip",
    root_dir=repo, base_dir="neuronews_spark",
)
print(out)
