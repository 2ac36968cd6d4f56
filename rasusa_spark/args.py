"""Job-argument combination validation — the engine analog of the
reference CLI's clap conflict matrix and I/O-combination checks
(reads.rs:27-243). Library callers get Python TypeErrors for malformed
kwargs anyway; this module adds the SEMANTIC combination rules the
reference enforces, so `scripts/run_job.py` (and any other front end)
rejects a contradictory job before touching the cluster:

- target-selection group (reads.rs:54-89): exactly ONE of
  coverage(+genome_size) / bases / num / frac / probability;
  ``coverage`` and ``genome_size`` require each other.
- ``probability`` (reads.rs:124-125, 202-207): conflicts with
  frac/num/bases/coverage AND ``strict``; expands to (frac, one_pass).
- ``one_pass`` (reads.rs:211-243): requires ``frac`` (num/bases/coverage
  need a measuring pass one-pass skips); cannot combine with ``strict``
  (probabilistic keep-count — nothing to enforce); rejects two separate
  alignment inputs (a single grouped file is the supported form).
- input/output combination (reads.rs:174-198): at most two of each;
  counts must match, except one input with zero outputs (stdout analog:
  the default sink).
- format conversion (reads.rs:377-399): an alignment-format output for a
  non-alignment input is rejected — the engine reads BAM fixtures
  (sources/bam.py) but has no alignment writer, same contract as the
  reference's FASTA→BAM refusal.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

#: extensions that mark an alignment-format path (sources/bam.py reads
#: these; there is no alignment SINK — format.rs / noodles formats)
ALIGNMENT_EXTS = ("sam", "bam", "cram")


class ArgCombinationError(ValueError):
    """A contradictory argument combination (CliError analog)."""


@dataclass(frozen=True)
class JobArgs:
    """Normalized downsample-job arguments (ReadsArgs analog)."""

    inputs: tuple[str, ...]
    outputs: tuple[str, ...] = ()
    coverage: float | None = None
    genome_size: int | None = None
    bases: int | None = None
    num: int | None = None
    frac: float | None = None
    probability: float | None = None
    one_pass: bool = False
    strict: bool = False
    output_format: str | None = None


def _is_alignment_path(path: str | None) -> bool:
    if not path:
        return False
    name = path.rstrip("/").rsplit("/", 1)[-1].lower()
    exts = name.split(".")[1:]
    # strip one trailing compression extension, as infer_format does
    if exts and exts[-1] in ("gz", "bz2", "xz", "zst", "zstd", "lzma"):
        exts = exts[:-1]
    return bool(exts) and exts[-1] in ALIGNMENT_EXTS


def validate_job_args(args: JobArgs) -> JobArgs:
    """Validate the combination matrix and return the NORMALIZED args
    (probability expanded into frac+one_pass, reads.rs:202-207). Raises
    :class:`ArgCombinationError` on any contradiction — before any Spark
    work is scheduled."""
    # --- target-selection conflict group (clap conflicts_with_all) ------
    conflicts = {
        "coverage": args.coverage is not None,
        "bases": args.bases is not None,
        "num": args.num is not None,
        "frac": args.frac is not None,
        "probability": args.probability is not None,
    }
    chosen = [k for k, v in conflicts.items() if v]
    if len(chosen) > 1:
        raise ArgCombinationError(
            f"conflicting targets {chosen}: pick exactly one of "
            "coverage/bases/num/frac/probability (reads.rs:54-125)"
        )
    # coverage <-> genome_size mutual requirement (reads.rs:54, 68) —
    # checked before the no-target error so a lone genome_size reports the
    # specific missing half, as clap's `requires` does
    if (args.coverage is not None) != (args.genome_size is not None):
        missing = "genome_size" if args.coverage is not None else "coverage"
        raise ArgCombinationError(
            f"coverage and genome_size require each other; missing {missing}"
        )
    if not chosen:
        raise ArgCombinationError(
            "no target given: one of coverage/bases/num/frac/probability "
            "is required"
        )

    # --- probability shorthand (reads.rs:124-125, 202-207) --------------
    if args.probability is not None:
        if args.strict:
            raise ArgCombinationError(
                "probability cannot be combined with strict (reads.rs:125)"
            )
        args = replace(
            args, probability=None, frac=args.probability, one_pass=True
        )

    # --- one-pass rules (reads.rs:211-243) ------------------------------
    if args.one_pass:
        if args.frac is None:
            raise ArgCombinationError(
                "one_pass requires frac: num/bases/coverage need an exact "
                "count or the input's total token count up front — the "
                "measuring pass one-pass mode skips (reads.rs:219-224)"
            )
        if args.strict:
            raise ArgCombinationError(
                "one_pass cannot be combined with strict: probabilistic "
                "sampling makes no keep-count guarantee to enforce "
                "(reads.rs:227-231)"
            )
        if len(args.inputs) == 2 and any(
            _is_alignment_path(p) for p in args.inputs
        ):
            raise ArgCombinationError(
                "one_pass does not support two separate alignment inputs — "
                "use a single grouped file (reads.rs:233-242)"
            )

    # --- input/output combination (reads.rs:174-198) --------------------
    n_in, n_out = len(args.inputs), len(args.outputs)
    if n_in == 0:
        raise ArgCombinationError("at least one input is required")
    if n_in > 2:
        raise ArgCombinationError("got more than 2 inputs")
    if n_out > 2:
        raise ArgCombinationError("got more than 2 outputs")
    if n_in - n_out != 0 and not (n_in == 1 and n_out == 0):
        raise ArgCombinationError(
            f"got {n_in} inputs but {n_out} outputs — counts must match "
            "(one input with zero outputs writes to the default sink)"
        )

    # --- format conversion rejection (reads.rs:377-399) -----------------
    for idx, inp in enumerate(args.inputs):
        if _is_alignment_path(inp):
            continue
        out_fmt_is_alignment = (
            args.output_format is not None
            and args.output_format.lower() in ALIGNMENT_EXTS
        ) or _is_alignment_path(args.outputs[idx] if idx < n_out else None)
        if out_fmt_is_alignment:
            raise ArgCombinationError(
                "conversion from a table input to an alignment-format "
                "output is not supported — use a table format for table "
                "input (reads.rs:388)"
            )
    return args
