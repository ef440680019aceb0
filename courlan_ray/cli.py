"""Command-line interface — parity with the reference CLI
(/root/reference/courlan/cli.py:20-75: ``courlan -i in.txt -o out.txt
[-d discarded.txt] [--sample N] [--strict] [--language XX] [-p N]``),
executed as a streaming Ray Data pipeline instead of a ProcessPoolExecutor.

``-p/--parallel`` maps to the Ray session's CPU count.  Output order is
not guaranteed (the reference's as_completed merge was unordered too,
cli.py:171-176).
"""

from __future__ import annotations

import argparse
import sys


def parse_args(args=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="courlan-ray",
        description="Clean, filter, normalize and sample URLs at scale")
    io = p.add_argument_group("I/O")
    io.add_argument("-i", "--inputfile", required=True,
                    help="name of input file (one URL per line)")
    io.add_argument("-o", "--outputfile", required=True,
                    help="name of output file")
    io.add_argument("-d", "--discardedfile",
                    help="name of file to store discarded URLs")
    io.add_argument("-v", "--verbose", action="store_true")
    io.add_argument("-p", "--parallel", type=int, default=4,
                    help="number of CPUs for the Ray session")
    filt = p.add_argument_group("Filtering")
    filt.add_argument("--strict", action="store_true",
                      help="stricter filtering")
    filt.add_argument("-l", "--language", help="target language (ISO 639-1)")
    samp = p.add_argument_group("Sampling")
    samp.add_argument("--sample", type=int,
                      help="size of sample per domain")
    samp.add_argument("--exclude-max", type=int,
                      help="exclude domains with more than n URLs")
    samp.add_argument("--exclude-min", type=int,
                      help="exclude domains with less than n URLs")
    return p.parse_args(args)


def _read_lines(path: str):
    """Input lines, decoded tolerantly and stripped — the reference opens
    with errors='ignore' and strips every line (cli.py:104-106,140-152);
    Ray's read_text decodes strictly and would abort on one bad byte.
    Per-FILE parallelism (URL lists ship as many files at scale)."""
    import pyarrow as pa
    import ray.data as rd

    def to_lines(b: pa.Table) -> pa.Table:
        out = []
        for blob in b["bytes"].to_pylist():
            out.extend(l.strip() for l in
                       blob.decode("utf-8", errors="ignore").splitlines()
                       if l.strip())
        return pa.table({"text": pa.array(out, pa.string())})

    return rd.read_binary_files(path).map_batches(to_lines,
                                                  batch_format="pyarrow")


def process_args(args: argparse.Namespace) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.parallel,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    if args.verbose:
        import logging
        logging.getLogger("courlan_ray").setLevel(logging.DEBUG)

    from .pipelines.url_pipeline import process_urls, sample_by_host

    ds = _read_lines(args.inputfile)

    if args.sample:
        # reference parity: sampling builds its store with language=None
        # regardless of -l (reference cli.py:119-121)
        out = sample_by_host(ds, args.sample,
                             exclude_min=args.exclude_min,
                             exclude_max=args.exclude_max,
                             strict=args.strict, language=None)
        with open(args.outputfile, "w", encoding="utf-8") as fh:
            for batch in out.iter_batches(batch_size=65536,
                                          batch_format="pyarrow"):
                for url in batch["url"].to_pylist():
                    fh.write(url + "\n")
        return

    # ONE streaming pass writes both files (bounded memory; the reference
    # also splits accepted/discarded inside a single loop, cli.py:171-176)
    checked = process_urls(ds, strict=args.strict, language=args.language)
    disc_fh = open(args.discardedfile, "w", encoding="utf-8") \
        if args.discardedfile else None
    try:
        with open(args.outputfile, "w", encoding="utf-8") as fh:
            for batch in checked.iter_batches(batch_size=65536,
                                              batch_format="pyarrow"):
                valid = batch["valid"].to_pylist()
                norm = batch["url_norm"].to_pylist()
                raw = batch["url"].to_pylist()
                for ok, u_norm, u_raw in zip(valid, norm, raw):
                    if ok:
                        fh.write(u_norm + "\n")
                    elif disc_fh is not None:
                        disc_fh.write(u_raw + "\n")
    finally:
        if disc_fh is not None:
            disc_fh.close()


def main() -> None:
    process_args(parse_args())


if __name__ == "__main__":
    main()
