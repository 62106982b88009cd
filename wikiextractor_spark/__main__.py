"""CLI mirroring the reference's surface (reference
``WikiExtractor.py:683-754``) plus engine extensions.

    python -m wikiextractor_spark --infn DUMP [--incubator LANG]
        [--compress] [--out DIR] [--parser xml|line] [--vitalfn FILE]

Differences from the reference CLI, by design: output goes to a
directory of part files (``--out``, default ``./wiki_out``) instead of
an append-only ``wiki.txt`` in CWD; ``--vitalfn`` (wired but disabled
upstream) actually works; ``--parser line`` selects the bug-compatible
fallback parser.

Engine extension: ``--source wet|warc`` ingests Common-Crawl-style
archives instead of a MediaWiki dump — WET ``conversion`` records or
raw WARC ``response`` records (HTML stripped natively;
``--main-content`` routes through the block-level link-density
classifier, ``--with-meta`` keeps the declared title/lang) — and
writes the engine's ``documents`` surface as parquet, ready for
``prepare_corpus``.
"""

from __future__ import annotations

import argparse

from wikiextractor_spark.config import ExtractorConfig
from wikiextractor_spark.session import get_spark


# sentinel default for every source-scoped flag: "was this flag
# actually supplied" must be distinguishable from "was it left at its
# default", or an explicitly-passed default value (--source wet
# --parser xml) silently skips the compat check instead of erroring
# (r11 ADVICE).  The real defaults live in _SCOPED_DEFAULTS and are
# resolved post-parse.
_UNSET = object()

# dest → real default, for every flag scoped to one --source.  The
# resolution loop raises KeyError if a _WARC_ONLY/_DUMP_ONLY entry is
# missing here, so the two tables cannot silently desync.
_SCOPED_DEFAULTS = {
    "incubator": "",
    "compress": False,
    "parser": "xml",
    "vitalfn": None,
    "max_records_per_file": None,
    "main_content": False,
    "with_meta": False,
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="wikiextractor_spark", description="PySpark WikiExtractor"
    )
    p.add_argument("--infn", required=True, help="dump file (xml/.bz2/.gz)")
    p.add_argument(
        "--incubator",
        default=_UNSET,
        help="incubator language code (e.g. enm); keeps Wp/LANG/Title pages",
    )
    p.add_argument(
        "--compress", action="store_true", default=_UNSET,
        help="bzip2 output",
    )
    p.add_argument("--out", default="wiki_out", help="output directory")
    p.add_argument(
        "--parser",
        choices=("xml", "line"),
        default=_UNSET,
        help="xml = splittable Catalyst-native source (default); "
        "line = bug-compatible reference parser (one task per file)",
    )
    p.add_argument("--vitalfn", default=_UNSET, help="vital titles side file")
    p.add_argument(
        "--max-records-per-file",
        type=int,
        default=_UNSET,
        help="size-split the output (the reference's intended "
        "OutputSplitter behavior)",
    )
    p.add_argument(
        "--source",
        choices=("dump", "wet", "warc"),
        default="dump",
        help="input kind: dump = MediaWiki XML (reference surface); "
        "wet = Common Crawl WET conversion records; warc = raw WARC "
        "response records (HTML stripped natively). wet/warc write "
        "the documents surface as parquet to --out",
    )
    p.add_argument(
        "--main-content",
        action="store_true",
        default=_UNSET,
        help="(--source warc) extract the article body via the "
        "block-level link-density classifier instead of all text",
    )
    p.add_argument(
        "--with-meta",
        action="store_true",
        default=_UNSET,
        help="(--source warc) keep declared <title> and <html lang> "
        "columns",
    )
    # a flag declared with the sentinel default but absent from the
    # policy tuples would leak the raw _UNSET object into args (the
    # resolution loop only walks the tuples) — fail at parser
    # construction, not at first use of the bogus value
    scoped = set(_WARC_ONLY + _DUMP_ONLY)
    unresolved = [
        a.dest for a in p._actions
        if a.default is _UNSET and a.dest not in scoped
    ]
    if unresolved:
        raise AssertionError(
            f"sentinel-defaulted flags missing from the policy "
            f"tuples: {unresolved} — add them to _WARC_ONLY or "
            "_DUMP_ONLY (and _SCOPED_DEFAULTS)"
        )
    # and the REVERSE desync (r12 ADVICE): a dest listed in the policy
    # tuples whose argparse default is NOT the sentinel would make
    # _resolve_scoped treat the flag as always-supplied, so every run
    # with the other --source spuriously errors
    defaults = {a.dest: a.default for a in p._actions}
    not_sentinel = [
        d for d in sorted(scoped)
        if d not in defaults or defaults[d] is not _UNSET
    ]
    if not_sentinel:
        raise AssertionError(
            f"policy-tuple flags whose parser default is not _UNSET "
            f"(or that are missing from the parser): {not_sentinel} — "
            "declare them with default=_UNSET"
        )
    return p


# which flags belong to which --source is POLICY (stated here once);
# whether a flag was actually supplied is the sentinel test in
# _resolve_scoped — an explicitly-typed default value counts as
# supplied, unlike a value-vs-default compare
_WARC_ONLY = ("main_content", "with_meta")
_DUMP_ONLY = (
    "parser", "vitalfn", "compress", "incubator", "max_records_per_file",
)


def _resolve_scoped(args) -> set[str]:
    """Replace every source-scoped sentinel with its real default and
    return the dests the user EXPLICITLY supplied (including at the
    default value).  KeyError here means a flag was added to a policy
    tuple without a _SCOPED_DEFAULTS entry."""
    supplied: set[str] = set()
    for dest in _WARC_ONLY + _DUMP_ONLY:
        if getattr(args, dest) is _UNSET:
            setattr(args, dest, _SCOPED_DEFAULTS[dest])
        else:
            supplied.add(dest)
    return supplied


def _check_flag_compat(
    parser: argparse.ArgumentParser, args, supplied: set[str],
) -> None:
    """Reject flag/source combinations that would be silently ignored
    — a typo like ``--source wet --main-content`` must not produce a
    plausible-looking but differently-shaped output."""

    def names(dests) -> list[str]:
        return [
            "--" + d.replace("_", "-") for d in dests if d in supplied
        ]

    def reject(flags: list[str], source: str) -> None:
        if flags:
            parser.error(
                f"{', '.join(flags)} appl"
                f"{'y' if len(flags) > 1 else 'ies'} only to "
                f"--source {source} (got --source {args.source})"
            )

    if args.source != "warc":
        reject(names(_WARC_ONLY), "warc")
    if args.source != "dump":
        reject(names(_DUMP_ONLY), "dump")


def main(argv: list[str] | None = None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    _check_flag_compat(parser, args, _resolve_scoped(args))
    cfg = ExtractorConfig(incubator=args.incubator, compress=args.compress)
    spark = get_spark("wikiextractor-spark-cli")
    try:
        if args.source != "dump":
            from wikiextractor_spark.sources.wet import (
                warc_html_documents,
                wet_documents,
            )

            if args.source == "wet":
                docs = wet_documents(spark, args.infn)
            else:
                docs = warc_html_documents(
                    spark,
                    args.infn,
                    main_content=args.main_content,
                    with_meta=args.with_meta,
                )
            docs.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
            return
        if args.parser == "line":
            from pyspark.sql import functions as F

            from wikiextractor_spark.sink import render_documents, write_documents
            from wikiextractor_spark.sources.dump import filter_pages
            from wikiextractor_spark.sources.lineparser import read_pages_lineparser
            from wikiextractor_spark.sources.vital import (
                apply_vital_filter,
                read_vital_titles,
            )
            from wikiextractor_spark.udfs import make_clean_udf, make_compact_udf

            pages = filter_pages(
                read_pages_lineparser(spark, args.infn).drop("page_id_raw"), cfg
            )
            vital = (
                read_vital_titles(spark, args.vitalfn) if args.vitalfn else None
            )
            pages = apply_vital_filter(pages, vital)
            docs = pages.withColumn(
                "cleaned", make_clean_udf(cfg)(F.col("text"))
            ).withColumn("lines", make_compact_udf(cfg.keep_sections)(F.col("cleaned")))
            write_documents(
                render_documents(docs),
                args.out,
                compress=cfg.compress,
                max_records_per_file=args.max_records_per_file,
            )
        else:
            from wikiextractor_spark.pipeline import extract_to_text

            extract_to_text(
                spark,
                args.infn,
                args.out,
                cfg,
                vital_path=args.vitalfn,
                max_records_per_file=args.max_records_per_file,
            )
        print(f"wrote {args.out}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
