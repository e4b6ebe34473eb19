"""External-process transform: pipe rows through a user-supplied command.

The reference shells out to external per-record executables and parses
their stdout back into rows (its S4 surface: the MSMS/reduce subprocess
calls at ``/root/reference/pyPPI/surfaceComplementarity/VMD.py:61-71`` and
``bin/PatchDock-type`` stage drivers in ``/root/reference/bin/``). The
Spark-native shape is the classic ``RDD.pipe`` contract re-expressed over
``mapInPandas``: one subprocess PER PARTITION (amortized spawn), a writer
thread feeding the child's stdin while the parent consumes stdout (no
pipe-buffer deadlock), line-based protocol.

Scale notes: zero shuffle — the transform is row-local, so the plan is
scan → mapInPandas → downstream; the subprocess lifetime equals the
partition, so a 100 TB run spawns O(partitions) processes, not O(rows).
The child must emit EXACTLY one output line per input line (enforced;
a short-writing child raises rather than silently misaligning rows).

Protocol restriction (same as ``RDD.pipe``): records cross the pipe as
lines, so the transformed column must not contain ``\n``/``\r``. Rows
that do are rejected up front with a clear error (``on_newline="error"``)
or sanitized (``on_newline="strip"``).
"""

from __future__ import annotations

import subprocess
import threading

from pyspark.sql import DataFrame, functions as F


def pipe_transform(
    df: DataFrame,
    command: list[str],
    text_col: str = "text",
    out_col: str = "piped",
    on_newline: str = "error",
    batch_check: bool = True,
) -> DataFrame:
    """Run ``command`` once per partition; feed ``text_col`` values as
    stdin lines; attach the corresponding stdout lines as ``out_col``.

    ``command`` is an argv list (no shell). NULL text crosses as an empty
    line and comes back as whatever the command emits for it.
    """
    if on_newline not in ("error", "strip"):
        raise ValueError(f"unknown on_newline {on_newline!r}")
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} string"]
    )
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")

    def run_partition(batches):
        import pandas as pd

        batches = list(batches)
        if not batches:
            return
        proc = subprocess.Popen(
            command,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
        )

        texts: list[str] = []
        for b in batches:
            col = b[text_col]
            for v in col:
                v = "" if v is None else str(v)
                if "\n" in v or "\r" in v:
                    if on_newline == "error":
                        proc.kill()
                        raise ValueError(
                            "pipe_transform: record contains a newline — the "
                            "line protocol cannot carry it; pre-normalize the "
                            "column or pass on_newline='strip'"
                        )
                    v = v.replace("\r", " ").replace("\n", " ")
                texts.append(v)

        def feed() -> None:
            try:
                for t in texts:
                    proc.stdin.write(t + "\n")
                proc.stdin.close()
            except BrokenPipeError:
                pass  # child exited early; the read side raises below

        writer = threading.Thread(target=feed, daemon=True)
        writer.start()
        out_lines = [line.rstrip("\n") for line in proc.stdout]
        writer.join()
        rc = proc.wait()
        if rc != 0:
            raise RuntimeError(f"pipe_transform: {command[0]} exited with {rc}")
        if batch_check and len(out_lines) != len(texts):
            raise RuntimeError(
                f"pipe_transform: {command[0]} emitted {len(out_lines)} lines "
                f"for {len(texts)} input records — the one-line-per-record "
                "contract is violated"
            )

        pos = 0
        for b in batches:
            n = len(b)
            b = b.copy()
            b[out_col] = pd.Series(out_lines[pos:pos + n], index=b.index, dtype=object)
            pos += n
            yield b

    return df.mapInPandas(run_partition, schema=out_schema)


def newline_safe(col: str | F.Column = "text") -> F.Column:
    """Projection helper: collapse CR/LF so a column satisfies the pipe
    line protocol (mirrorable in SQL for oracles)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[\r\n]+", " ")
