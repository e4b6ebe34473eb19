"""External-process transform: pipe rows through a user-supplied command.

The reference shells out to external per-record executables and parses
their stdout back into rows (its S4 surface: the molprobity/reduce
subprocess stages at ``/root/reference/bin/setupPpiDb.py:86-108`` and the
MSMS calls in ``/root/reference/pyPPI/surfaceComplementarity/VDW.py``).
The Spark-native shape is the classic ``RDD.pipe`` contract re-expressed
over ``mapInPandas``: one subprocess PER PARTITION (amortized spawn), a
writer thread feeding the child's stdin while the parent consumes stdout
(no pipe-buffer deadlock), line-based protocol.

Scale notes: zero shuffle — the transform is row-local, so the plan is
scan → mapInPandas → downstream; the subprocess lifetime equals the
partition, so a 100 TB run spawns O(partitions) processes, not O(rows).
Memory is O(Arrow batch), NOT O(partition): the writer thread consumes
the source iterator directly (feeding the child as fast as it accepts
input, at most ``queue_batches`` batches ahead), and the reader yields
each batch's output rows as soon as the child emits them. The child must
emit EXACTLY one output line per input line (enforced; a short-writing
child raises rather than silently misaligning rows).

Child contract (same as ``RDD.pipe``): order-preserving, line-streaming.
A filter that withholds ALL output until EOF (``sort``-like) both breaks
row alignment semantically and — under the bounded feed-ahead — stalls
once its buffered output plus ``queue_batches`` of queued input stop
making progress; such children are outside the contract. Ordinary
block-buffered filters (``sed``, ``awk``, ``tr``) are fine: their output
buffer (4–64 KB) flushes as the writer runs ahead, and stdin close at
source end flushes the tail.

Protocol restriction: records cross the pipe as lines, so the
transformed column must not contain ``\n``/``\r``. Rows that do are
rejected up front with a clear error (``on_newline="error"``) or
sanitized (``on_newline="strip"``).
"""

from __future__ import annotations

import itertools
import queue as queue_mod
import subprocess
import threading

from pyspark.sql import DataFrame, functions as F

_DONE = object()


def _stream_pipe(
    batches,
    command: list[str],
    text_col: str,
    out_col: str,
    on_newline: str,
    batch_check: bool,
    queue_batches: int,
    stall_timeout_s: float = 300.0,
):
    """Generator: feed ``text_col`` of each pandas batch to ``command``'s
    stdin (writer thread, at most ``queue_batches`` batches ahead) and
    yield each batch with ``out_col`` attached as its stdout lines arrive.
    Peak memory ≈ (queue_batches + 1) batches, independent of partition
    size.

    Stall detection: if the reader consumes NOTHING for
    ``stall_timeout_s`` while the writer is blocked on the full hand-off
    queue, the three-way wait (reader ← child's unflushed output buffer ←
    more stdin ← queue space) cannot resolve itself — a block-buffered
    child whose output buffer exceeds the feed-ahead window (tiny rows ×
    small ``queue_batches``) deadlocks exactly this way. The writer then
    kills the child and raises a diagnostic naming the remedies (raise
    ``queue_batches``, or an unbuffered child à la ``sed -u`` /
    ``stdbuf -oL``) instead of hanging the Spark task forever."""
    import pandas as pd

    it = iter(batches)
    first = next(it, None)
    if first is None:
        return  # empty partition: never spawn the child
    batches = itertools.chain([first], it)

    proc = subprocess.Popen(
        command,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        text=True,
    )
    q: queue_mod.Queue = queue_mod.Queue(maxsize=queue_batches)
    err: list[BaseException] = []
    reader_gone = threading.Event()  # set when the consumer abandons us

    def feed() -> None:
        stdin_dead = False
        try:
            for b in batches:
                if reader_gone.is_set():
                    return  # consumer died: stop consuming, don't block on q
                lines = []
                for v in b[text_col]:
                    v = "" if v is None else str(v)
                    if "\n" in v or "\r" in v:
                        if on_newline == "error":
                            raise ValueError(
                                "pipe_transform: record contains a newline — "
                                "the line protocol cannot carry it; "
                                "pre-normalize the column or pass "
                                "on_newline='strip'"
                            )
                        v = v.replace("\r", " ").replace("\n", " ")
                    lines.append(v)
                # hand the batch to the reader BEFORE writing: the reader
                # must be able to drain stdout while this write blocks.
                # After a broken pipe keep enqueueing (writes skipped) so
                # the reader sees every input batch and raises the
                # short-output contract error instead of silently
                # truncating the partition.
                stalled = 0.0  # consecutive seconds blocked on a full queue
                while True:  # bounded put that notices a dead consumer
                    if reader_gone.is_set():
                        return
                    try:
                        q.put((b, lines), timeout=1.0)
                        break
                    except queue_mod.Full:
                        stalled += 1.0
                        if stalled >= stall_timeout_s:
                            raise RuntimeError(
                                f"pipe_transform: no output consumed for "
                                f"{int(stalled)} s with the feed-ahead queue "
                                f"full — {command[0]} is either deadlocked "
                                "(its output buffer exceeds the feed-ahead "
                                "window) or pathologically slow. Raise "
                                "queue_batches, use an unbuffered child "
                                "(sed -u / stdbuf -oL), or raise "
                                "stall_timeout_s for genuinely slow filters"
                            )
                        continue
                if not stdin_dead and lines:
                    try:
                        proc.stdin.write("\n".join(lines) + "\n")
                        proc.stdin.flush()
                    except BrokenPipeError:
                        stdin_dead = True
            if not stdin_dead:
                try:
                    proc.stdin.close()
                except BrokenPipeError:
                    pass
        except BaseException as e:  # noqa: BLE001 — relayed to the reader
            err.append(e)
            proc.kill()  # unblock the reader's stdout.readline()
        finally:
            while not reader_gone.is_set():
                try:
                    q.put(_DONE, timeout=1.0)
                    break
                except queue_mod.Full:
                    continue

    writer = threading.Thread(target=feed, daemon=True)
    writer.start()
    n_in = n_out = 0
    try:
        while True:
            item = q.get()
            if item is _DONE:
                break
            b, lines = item
            n_in += len(lines)
            out_lines: list[str | None] = []
            for _ in range(len(lines)):
                line = proc.stdout.readline()
                if line == "":
                    if err:
                        raise err[0]
                    # EOF: a crashed child should surface its exit code,
                    # not a misleading contract error
                    try:
                        rc = proc.wait(timeout=5)
                    except subprocess.TimeoutExpired:
                        rc = 0
                    if rc != 0:
                        raise RuntimeError(
                            f"pipe_transform: {command[0]} exited with {rc}"
                        )
                    if batch_check:
                        raise RuntimeError(
                            f"pipe_transform: {command[0]} emitted "
                            f"{n_out + len(out_lines)} lines for {n_in} input "
                            "records so far — the one-line-per-record "
                            "contract is violated"
                        )
                    out_lines.append(None)
                else:
                    out_lines.append(line.rstrip("\n"))
            n_out += len(out_lines)
            b = b.copy()
            b[out_col] = pd.Series(out_lines, index=b.index, dtype=object)
            yield b
        if err:
            raise err[0]
        extra = proc.stdout.readline()
        rc = proc.wait()
        if rc != 0:
            raise RuntimeError(f"pipe_transform: {command[0]} exited with {rc}")
        if batch_check and extra != "":
            raise RuntimeError(
                f"pipe_transform: {command[0]} emitted more lines than the "
                f"{n_in} input records — the one-line-per-record contract "
                "is violated"
            )
    finally:
        reader_gone.set()  # release a writer blocked on the full queue
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def pipe_transform(
    df: DataFrame,
    command: list[str],
    text_col: str = "text",
    out_col: str = "piped",
    on_newline: str = "error",
    batch_check: bool = True,
    queue_batches: int = 16,
    stall_timeout_s: float = 300.0,
) -> DataFrame:
    """Run ``command`` once per partition; feed ``text_col`` values as
    stdin lines; attach the corresponding stdout lines as ``out_col``.

    ``command`` is an argv list (no shell). NULL text crosses as an empty
    line and comes back as whatever the command emits for it. Memory is
    bounded by ``queue_batches`` Arrow batches (the writer's feed-ahead
    window), not by the partition — raise it only for children with
    unusually large internal buffering relative to the batch size.
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
        yield from _stream_pipe(
            batches, command, text_col, out_col, on_newline, batch_check,
            queue_batches, stall_timeout_s,
        )

    return df.mapInPandas(run_partition, schema=out_schema)


def newline_safe(col: str | F.Column = "text") -> F.Column:
    """Projection helper: collapse CR/LF so a column satisfies the pipe
    line protocol (mirrorable in SQL for oracles)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[\r\n]+", " ")
