"""Write-once parquet cache shared by every synthetic source and the
oracle-side signature tables.

One copy of the check-marker / rmtree / write / stamp sequence so a fix to
the marker handling propagates to every cache (synth, audio, video, HTML,
oracle signatures) instead of five drifting copies.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable


def cached_parquet(out: str, make_ds: Callable[[], "object"],
                   rows_per_file: int, marker: str = "ok") -> str:
    """Materialize ``make_ds()`` as parquet under ``out`` exactly once.

    The ``_SUCCESS`` file stores ``marker``; a rerun skips the write only
    when the stored marker matches, so callers key staleness into the
    marker (e.g. a kernel-source fingerprint) while deterministic synth
    tables keyed fully by their directory name keep the default.  A
    partial directory from a crashed write has no marker and is wiped and
    rebuilt.  ``rows_per_file`` bounds parquet file size both ways so read
    parallelism is never capped by the file count.  Returns ``out``.
    """
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        with open(done) as fh:
            if fh.read().strip() == marker:
                return out
    shutil.rmtree(out, ignore_errors=True)
    make_ds().write_parquet(out, min_rows_per_file=rows_per_file,
                            max_rows_per_file=rows_per_file)
    with open(done, "w") as fh:
        fh.write(marker)
    return out
