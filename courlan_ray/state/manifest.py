"""Checkpoint manifest: per-stage durable parquet + lineage records.

The scale replacement for the reference's whole-store pickle persistence
(``UrlStore.write`` / ``load_store``, /root/reference/courlan/urlstore.py:573-583)
and its signal-triggered dump (urlstore.py:144-159): each stage of the
pipeline writes its (narrow) output to a partitioned parquet directory
under the checkpoint root, atomically (write to tmp, rename), and appends
a manifest record with row counts, per-file layout, wall time and a
**cumulative config fingerprint**.

Fingerprints chain: stage_fp = sha256(upstream_fp + this stage's relevant
config fields).  Changing a verification threshold therefore invalidates
``verified_pairs`` and everything after it, but ``signatures`` and
``candidates`` hit cache — the SURVEY.md §7.4 resume-correctness rule.

A resumed run (same root, same config) returns ``read_parquet`` of the
completed stage directory without recomputing — mid-run resume skips
completed band buckets because candidate/pair state is already durable.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict

from ..config import DedupConfig

# config fields that affect each stage's OUTPUT (cumulative downstream).
# "sigtable" is the fused canonicalize+signatures traversal
# (pipelines/image_dedup.py), so it owns both gate and signature fields.
STAGE_FIELDS: dict[str, tuple[str, ...]] = {
    "sigtable": ("strict", "language", "min_caption_len",
                 "max_caption_len", "allowed_formats", "min_dim", "max_dim",
                 "shingle_width", "num_perm", "seed", "fingerprint_k",
                 "fingerprint_window", "channels"),
    "exact_edges": ("seed",),
    "candidates": ("bands", "phash_bands", "num_salts", "weak_bucket_cap"),
    "verified_pairs": ("jaccard_threshold", "hamming_threshold",
                       "simhash_hamming_threshold", "substring_min_ratio"),
    "components": ("cc_max_rounds",),
    "clusters": ("sample_k", "exclude_min", "exclude_max"),
}
STAGE_ORDER = list(STAGE_FIELDS)


class Checkpoint:
    """Stage runner with durable parquet outputs and manifest lineage."""

    def __init__(self, root: str, cfg: DedupConfig,
                 input_fingerprint: str = ""):
        self.root = root
        self.cfg = cfg
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, "manifest.jsonl")
        self._fps = self._chain_fingerprints(cfg, input_fingerprint)

    @staticmethod
    def _chain_fingerprints(cfg: DedupConfig, input_fp: str) -> dict[str, str]:
        d = asdict(cfg)
        fps = {}
        acc = input_fp
        for stage in STAGE_ORDER:
            fields = {k: d.get(k) for k in STAGE_FIELDS[stage]}
            blob = acc + json.dumps(fields, sort_keys=True, default=str)
            acc = hashlib.sha256(blob.encode()).hexdigest()[:16]
            fps[stage] = acc
        return fps

    def stage_fingerprint(self, name: str) -> str:
        return self._fps.get(name, self._fps[STAGE_ORDER[-1]])

    def _dir(self, name: str) -> str:
        return os.path.join(self.root,
                            # no '=' in the name: key=value path segments
                            # trigger hive-partition inference on read and
                            # would inject a spurious 'stage' column
                            f"stage-{name}-{self.stage_fingerprint(name)}")

    def completed(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._dir(name), "_SUCCESS"))

    def run(self, name: str, make):
        """Return the stage's Dataset: cached parquet if this (stage,
        fingerprint) already completed, else compute + persist + record."""
        import ray.data as rd

        out_dir = self._dir(name)
        if self.completed(name):
            self._record(name, status="skipped", out_dir=out_dir)
            return rd.read_parquet(out_dir)

        t0 = time.time()
        ds = make()
        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        ds.write_parquet(tmp_dir)
        # a zero-row stage (e.g. no exact duplicates) writes NO files;
        # persist one empty schema-bearing file so the resumed
        # read_parquet returns the same (empty, typed) dataset instead of
        # failing on an empty directory
        os.makedirs(tmp_dir, exist_ok=True)   # zero-row write creates nothing
        if not any(f.endswith(".parquet") for f in os.listdir(tmp_dir)):
            import pyarrow as pa
            import pyarrow.parquet as pq
            schema = ds.schema()
            empty = pa.table({n: pa.array([], t) for n, t in
                              zip(schema.names, schema.types)})
            pq.write_table(empty, os.path.join(tmp_dir, "empty.parquet"))
        os.replace(tmp_dir, out_dir)
        result = rd.read_parquet(out_dir)
        files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
        # per-PARTITION lineage (north_rule): one record per output file
        # with its row count (parquet footer metadata only — no data read),
        # so a resumed run can audit exactly which partitions exist
        import pyarrow.parquet as pq
        parts = {f: pq.read_metadata(os.path.join(out_dir, f)).num_rows
                 for f in files}
        self._record(name, status="computed", out_dir=out_dir,
                     rows=result.count(), n_files=len(files),
                     partition_rows=parts,
                     wall_sec=round(time.time() - t0, 3))
        with open(os.path.join(out_dir, "_SUCCESS"), "w") as fh:
            fh.write(self.stage_fingerprint(name))
        return rd.read_parquet(out_dir)

    def run_sharded(self, name: str, input_files: list[str], make,
                    n_shards: int = 16):
        """SHARD-granular resumable stage for map-only transforms.

        ``input_files`` (e.g. the parquet files of the input table) are
        grouped round-robin into ``n_shards`` shards; each shard's output
        is written to its own subdirectory (``shard=NNNNN``) with a
        ``_SUCCESS`` marker, and a per-shard manifest record is appended.
        A resumed run (same root/config) recomputes ONLY shards without a
        marker — the north_rule's "resume mid-run without recomputing
        completed partitions" at sub-stage granularity, with zero read
        amplification (each shard reads only its own input files).

        ``make(shard_ds) -> Dataset`` must be a per-row/per-file transform
        (no cross-shard state) — true for signature/canonicalize stages,
        not for shuffles."""
        import ray.data as rd

        out_root = self._dir(name)
        os.makedirs(out_root, exist_ok=True)
        files = sorted(input_files)
        shards = [files[s::n_shards] for s in range(n_shards)]
        for s, shard_files in enumerate(shards):
            if not shard_files:
                continue
            # dash, not "shard=NNNNN": key=value dirs trigger Ray's hive
            # partitioning and would surface a spurious 'shard' column,
            # diverging the sharded schema from the unsharded one
            sdir = os.path.join(out_root, f"shard-{s:05d}")
            if os.path.exists(os.path.join(sdir, "_SUCCESS")):
                self._record(name, status="shard_skipped", shard=s,
                             out_dir=sdir)
                continue
            t0 = time.time()
            ds = make(rd.read_parquet(shard_files))
            tmp = sdir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(sdir, ignore_errors=True)
            ds.write_parquet(tmp)
            # mirror run(): a zero-row shard (e.g. all rows filtered) writes
            # NO files — write_parquet may not even create the directory —
            # so persist one empty schema-bearing file before the rename
            os.makedirs(tmp, exist_ok=True)
            if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
                import pyarrow as pa
                import pyarrow.parquet as pq
                schema = ds.schema()
                empty = pa.table({n: pa.array([], t) for n, t in
                                  zip(schema.names, schema.types)})
                pq.write_table(empty, os.path.join(tmp, "empty.parquet"))
            os.replace(tmp, sdir)
            rows = rd.read_parquet(sdir).count()
            with open(os.path.join(sdir, "_SUCCESS"), "w") as fh:
                fh.write(self.stage_fingerprint(name))
            self._record(name, status="shard_computed", shard=s,
                         out_dir=sdir, rows=rows, n_input_files=len(shard_files),
                         wall_sec=round(time.time() - t0, 3))
        with open(os.path.join(out_root, "_SUCCESS"), "w") as fh:
            fh.write(self.stage_fingerprint(name))
        return rd.read_parquet(out_root)

    def _record(self, name: str, **kw) -> None:
        rec = {"stage": name, "config_fp": self.stage_fingerprint(name),
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
        with open(self.manifest_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def records(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as fh:
            return [json.loads(line) for line in fh if line.strip()]
