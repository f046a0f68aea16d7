"""Multi-class probabilistic filter model.

Behavioral contract mirrors the reference's ``ProbabilisticFilterModel``
(reference: src/xspect/models/probabilistic_filter_model.py): one filter
column per class built from one FASTA/FASTQ file per class (class name =
filename up to the first "."), ``calculate_hits`` = number of query
k-mers present per class, ``predict`` over records, files or record
lists producing a :class:`~xspect2_tpu.models.result.ModelResult`,
metadata JSON + binary index artifacts under ``base_path``.

The engine differs: instead of a process-local COBS C++ index queried
record-by-record, records are packed host-side into flat batches and
hit-counted on the accelerator by
:class:`~xspect2_tpu.ops.query.DeviceQueryEngine` (optionally sharded
over a device mesh, see :mod:`xspect2_tpu.parallel`).
"""

import json
import math
import os
from pathlib import Path
from typing import Any, Iterable, Iterator

import numpy as np

from xspect2_tpu.core import dna
from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
from xspect2_tpu.definitions import fasta_endings, fastq_endings, slugify
from xspect2_tpu.io.fasta import SeqRecord, get_record_iterator
from xspect2_tpu.models.result import ModelResult
from xspect2_tpu.ops.query import (
    DEFAULT_MAX_BATCH_BASES,
    DeviceQueryEngine,
    prepare_batch,
)


class ProbabilisticFilterModel:
    """Multi-class k-mer filter model over one blocked bit-sliced index."""

    def __init__(
        self,
        k: int,
        model_display_name: str,
        author: str | None,
        author_email: str | None,
        model_type: str,
        base_path: Path,
        fpr: float = 0.01,
        num_hashes: int | None = None,
        training_accessions: dict[str, list[str]] | None = None,
    ) -> None:
        if k < 1:
            raise ValueError("Invalid k value, must be greater than 0")
        if not model_display_name:
            raise ValueError("Invalid filter display name, must be a non-empty string")
        if not model_type:
            raise ValueError("Invalid filter type, must be a non-empty string")
        if not isinstance(base_path, Path):
            raise ValueError("Invalid base path, must be a pathlib.Path object")

        self.k = k
        self.model_display_name = model_display_name
        self.author = author
        self.author_email = author_email
        self.model_type = model_type
        self.base_path = base_path
        self.display_names: dict[str, str] = {}
        self.fpr = fpr
        # None = pick the probe count at fit time for query speed at
        # equal fpr (core/blocked_index.py::pick_num_hashes); resolved
        # value is stored in the metadata so loads are deterministic
        self.num_hashes = num_hashes
        self.index: BlockedBitSlicedIndex | None = None
        self.training_accessions = training_accessions
        self._engine: DeviceQueryEngine | None = None

    # ------------------------------------------------------------------ paths / meta

    def slug(self) -> str:
        return slugify(self.model_display_name + "-" + str(self.model_type))

    def get_index_path(self) -> Path:
        """Directory holding the index artifacts for this model."""
        return self.base_path / self.slug() / "index.bbsi"

    def to_dict(self) -> dict:
        return {
            "model_slug": self.slug(),
            "k": self.k,
            "model_display_name": self.model_display_name,
            "author": self.author,
            "author_email": self.author_email,
            "model_type": self.model_type,
            "model_class": self.__class__.__name__,
            "display_names": self.display_names,
            "fpr": self.fpr,
            "num_hashes": (
                self.index.num_hashes if self.index is not None else self.num_hashes
            ),
            "training_accessions": self.training_accessions,
        }

    # ------------------------------------------------------------------ training

    def _training_files(self, dir_path: Path) -> list[Path]:
        files = [
            f
            for f in sorted(dir_path.iterdir())
            if f.is_file() and f.suffix[1:] in fasta_endings + fastq_endings
        ]
        return files

    def fit(
        self,
        dir_path: Path,
        display_names: dict | None = None,
        training_accessions: dict[str, list[str]] | None = None,
    ) -> None:
        """Build the index from one sequence file per class in ``dir_path``."""
        if display_names is None:
            display_names = {}
        if not isinstance(dir_path, Path):
            raise ValueError("Invalid directory path, must be a pathlib.Path object")
        if not dir_path.exists():
            raise ValueError("Directory path does not exist")
        if not dir_path.is_dir():
            raise ValueError("Directory path must be a directory")

        self.training_accessions = training_accessions

        files = self._training_files(dir_path)
        if not files:
            raise ValueError(
                "No valid files found in directory. Must be fasta or fastq"
            )

        class_names = []
        for file in files:
            doc_name = file.name.split(".")[0]
            class_names.append(doc_name)
            if file.stem in display_names:
                self.display_names[doc_name] = display_names[file.stem]
            else:
                self.display_names[doc_name] = file.stem

        # first pass: count k-mers per class for sizing (native parser when
        # built; python fallback otherwise)
        from xspect2_tpu import native

        parsed: dict[int, tuple] = {}
        kmer_counts = []
        for fi, file in enumerate(files):
            if native.available():
                codes, offsets, _ids = native.parse_file(file)
                parsed[fi] = (codes, offsets)
                lengths = np.diff(offsets)
            else:
                lengths = np.asarray(
                    [len(r.seq) for r in get_record_iterator(file)]
                )
            kmer_counts.append(int(np.maximum(0, lengths - self.k + 1).sum()))

        index = BlockedBitSlicedIndex.create(
            self.k,
            class_names,
            max(kmer_counts) if kmer_counts else 1,
            fpr=self.fpr,
            num_hashes=self.num_hashes,
        )
        self.num_hashes = index.num_hashes
        for ci, file in enumerate(files):
            if ci in parsed:
                codes, offsets = parsed[ci]
                for r in range(len(offsets) - 1):
                    native.insert_kmers(
                        index, ci, codes[offsets[r] : offsets[r + 1]]
                    )
            else:
                for record in get_record_iterator(file):
                    hi, lo, valid = dna.canonical_kmers(
                        dna.encode(record.seq), self.k
                    )
                    index.insert_kmers(ci, hi, lo, valid)

        self.index = index
        self._engine = None
        index.save(self.get_index_path())

    # ------------------------------------------------------------------ inference

    @property
    def engine(self) -> DeviceQueryEngine:
        if self._engine is None:
            if self.index is None:
                raise ValueError("The model has not been trained yet")
            self._engine = DeviceQueryEngine(self.index)
        return self._engine

    def _hits_dict_from_counts(
        self, counts: np.ndarray, exclude_ids: list[str] | None
    ) -> dict[str, int]:
        """Build one record's {class: hits} dict, ranked by score like a
        COBS search result (descending count, ties by name)."""
        names = self.index.class_names
        order = sorted(range(len(names)), key=lambda i: (-int(counts[i]), names[i]))
        excluded = set(exclude_ids) if exclude_ids else ()
        return {
            names[i]: int(counts[i]) for i in order if names[i] not in excluded
        }

    def calculate_hits(
        self, sequence, exclude_ids: list[str] | None = None, step: int = 1
    ) -> dict:
        """Hit counts of one sequence per class."""
        seq = sequence.seq if isinstance(sequence, SeqRecord) else sequence
        if not isinstance(seq, str):
            raise ValueError("Invalid sequence, must be a string or SeqRecord")
        if not len(seq) > self.k:
            raise ValueError("Invalid sequence, must be longer than k")
        counts = self.engine.count_hits_records(
            [("seq", dna.encode(seq))], step=step
        )[0]
        return self._hits_dict_from_counts(counts, exclude_ids)

    def _iter_record_batches(
        self, records: Iterable[SeqRecord], max_bases: int = DEFAULT_MAX_BATCH_BASES
    ) -> Iterator[list[SeqRecord]]:
        batch: list[SeqRecord] = []
        bases = 0
        for rec in records:
            batch.append(rec)
            bases += len(rec.seq)
            if bases >= max_bases or len(batch) >= 65536:
                yield batch
                batch, bases = [], 0
        if batch:
            yield batch

    def _predict_path_fast(
        self,
        path: Path,
        exclude_ids: list[str] | None,
        step: int,
        display_name: bool,
    ) -> ModelResult | None:
        """Uniform-read file fast route: native parse + matrix query.

        FASTQ read files (the throughput-critical input; BASELINE.json
        config 4) have uniform record lengths, so the whole file parses
        natively into one [N, L] code matrix and queries through the
        packed device wire — no per-record Python parsing or batch
        preparation.  Returns None when not applicable (ragged records,
        small inputs or no native library) so the caller falls back to
        the general path; both paths produce identical results
        (pinned by tests/test_reads_fast_path.py).
        """
        from xspect2_tpu import native
        from xspect2_tpu.ops.query import _next_pow2

        if not native.available():
            return None
        parsed = native.parse_file(path)
        if parsed is None:
            return None
        codes, offsets, ids = parsed
        n = len(ids)
        if n < 512:
            return None
        lengths = np.diff(offsets)
        if not (lengths == lengths[0]).all():
            return None
        length = int(lengths[0])
        if not length > self.k:
            raise ValueError("Invalid sequence, must be longer than k")

        mat = codes.reshape(n, length)
        rpc = 4096
        # bound device-resident batch size: a multi-GB FASTQ streams in
        # bounded slices (pipelined with block=False — the next slice's
        # host packing overlaps the previous slice's device execution)
        # instead of materializing one [n, L] array in HBM
        max_bases = int(
            os.environ.get("XSPECT_MAX_FAST_BATCH_BASES", 1 << 28)
        )
        cap = max(rpc, (max_bases // length) // rpc * rpc)
        # bound in-flight slices at 3 so only a few packed buffers are
        # device-resident at once (the next slice's packing overlaps the
        # previous slice's execution; an unbounded queue would re-create
        # the whole-file-in-HBM problem the cap exists to avoid)
        pending = []
        parts = []
        for s0 in range(0, n, cap):
            sl = mat[s0 : s0 + cap]
            m = len(sl)
            m_pad = rpc * _next_pow2(max(1, -(-m // rpc)))
            if m_pad != m:
                pad = np.full((m_pad - m, length), 255, dtype=np.uint8)
                sl = np.concatenate([sl, pad])
            out = self.engine.count_hits_reads(
                sl, step=step, reads_per_chunk=rpc, block=False
            )
            pending.append((out, m))
            while len(pending) >= 3:
                out, m = pending.pop(0)
                parts.append(np.asarray(out)[:m])
        parts.extend(np.asarray(out)[:m] for out, m in pending)
        counts = np.concatenate(parts).astype(np.int64)

        nk = math.ceil((length - self.k + 1) / step)
        hits: dict[str, dict[str, int]] = {}
        num_kmers: dict[str, int] = {}
        for i, rid in enumerate(ids):
            rec_hits = self._hits_dict_from_counts(counts[i], exclude_ids)
            if display_name:
                rec_hits = {
                    f"{key} -{self.display_names.get(key, 'Unknown').replace(self.model_display_name, '', 1)}": v
                    for key, v in rec_hits.items()
                }
            hits[rid] = rec_hits
            num_kmers[rid] = nk
        return ModelResult(self.slug(), hits, num_kmers, sparse_sampling_step=step)

    def predict(
        self,
        sequence_input: SeqRecord | list | Iterator | Path,
        exclude_ids: list[str] | None = None,
        step: int = 1,
        display_name: bool = False,
        validation: bool = False,
    ) -> ModelResult:
        """Classify records/file and return a :class:`ModelResult`."""
        if isinstance(sequence_input, Path) and not validation:
            fast = self._predict_path_fast(
                sequence_input, exclude_ids, step, display_name
            )
            if fast is not None:
                return fast
        records = self._as_record_iterable(sequence_input)

        hits: dict[str, dict[str, int]] = {}
        num_kmers: dict[str, int] = {}
        kept_records: list[SeqRecord] = [] if validation else None

        for rec_batch in self._iter_record_batches(records):
            batch = prepare_batch(
                [(rec.id, dna.encode(rec.seq)) for rec in rec_batch],
                self.k,
                step=step,
                chunk=self.engine.chunk,
            )
            counts = self.engine.count_hits(batch)
            for i, rec in enumerate(rec_batch):
                rec_hits = self._hits_dict_from_counts(counts[i], exclude_ids)
                if display_name:
                    rec_hits = {
                        f"{key} -{self.display_names.get(key, 'Unknown').replace(self.model_display_name, '', 1)}": v
                        for key, v in rec_hits.items()
                    }
                hits[rec.id] = rec_hits
                num_kmers[rec.id] = batch.num_kmers[i]
            if validation:
                kept_records.extend(rec_batch)

        if not hits:
            raise ValueError("No sequences found in input")

        if validation:
            hits = self.detecting_misclassification(hits, kept_records)

        return ModelResult(self.slug(), hits, num_kmers, sparse_sampling_step=step)

    def _as_record_iterable(self, sequence_input) -> Iterable[SeqRecord]:
        if isinstance(sequence_input, SeqRecord):
            return [sequence_input]
        if isinstance(sequence_input, Path):
            return get_record_iterator(sequence_input)
        if isinstance(sequence_input, (list, tuple)):
            if not all(isinstance(r, SeqRecord) for r in sequence_input):
                raise ValueError(
                    "Invalid sequence input, must be SeqRecord objects"
                )
            return sequence_input
        if hasattr(sequence_input, "__iter__") or hasattr(sequence_input, "__next__"):
            return sequence_input
        raise ValueError(
            "Invalid sequence input, must be a SeqRecord, a list of SeqRecords, "
            "a record iterator, or a Path object to a fasta/fastq file"
        )

    def _count_kmers(self, sequence_input: Any, step: int = 1) -> int:
        """ceil((len - k + 1) / step) summed over the input sequences."""
        if isinstance(sequence_input, str):
            return math.ceil((len(sequence_input) - self.k + 1) / step)
        if isinstance(sequence_input, SeqRecord):
            return self._count_kmers(sequence_input.seq, step=step)
        total = 0
        for seq in sequence_input:
            total += self._count_kmers(seq, step=step)
        return total

    # ------------------------------------------------------------------ persistence

    def save(self) -> None:
        json_path = self.base_path / f"{self.slug()}.json"
        filter_path = self.base_path / self.slug()
        filter_path.mkdir(exist_ok=True, parents=True)
        json_path.write_text(
            json.dumps(self.to_dict(), indent=4), encoding="utf-8"
        )

    @classmethod
    def _from_metadata(cls, model_json: dict, base_path: Path):
        return cls(
            model_json["k"],
            model_json["model_display_name"],
            model_json["author"],
            model_json["author_email"],
            model_json["model_type"],
            base_path,
            model_json["fpr"],
            model_json["num_hashes"],
            model_json["training_accessions"],
        )

    @classmethod
    def load(cls, path: Path) -> "ProbabilisticFilterModel":
        model_json = json.loads(Path(path).read_text(encoding="utf-8"))
        model = cls._from_metadata(model_json, Path(path).parent)
        model.display_names = model_json["display_names"]
        index_path = model.get_index_path()
        if not index_path.exists():
            raise FileNotFoundError(f"Index file not found at {index_path}")
        model.index = BlockedBitSlicedIndex.load(index_path)
        return model

    # ------------------------------------------------------------------ validation post-filter

    def detecting_misclassification(
        self,
        hits: dict[str, dict[str, int]],
        seq_records: list[SeqRecord],
        min_reads: int = 10,
    ) -> dict[str, dict[str, int]]:
        """Alignment-based misclassification post-filter.

        Groups reads by unique-argmax class, maps suspect groups onto the
        class's reference genome and removes spatially clustered groups
        (reference: src/xspect/models/probabilistic_filter_model.py:508-601).
        Implemented in :mod:`xspect2_tpu.misclassification_detection`.
        """
        from xspect2_tpu.misclassification_detection import detect_misclassification

        return detect_misclassification(hits, seq_records, min_reads=min_reads)
