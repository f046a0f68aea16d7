"""MLST (multi-locus sequence typing) scheme model.

One blocked bit-sliced index per locus, one class (column) per allele
FASTA (doc name = filename up to the first ".", e.g. ``Allele_ID_4``).
Behavioral contract mirrors the reference
(reference: src/xspect/models/probabilistic_filter_mlst_model.py):

- defaults fpr=0.001, num_hashes=1, k=31 (from the trainer,
  reference: src/xspect/train.py:345-363),
- sequences >= 10,000 bp are split into overlapping chunks (overlap
  k-1; chunk length = avg allele length x1/x10/x100 by total length),
  per-chunk results with score > 50 are summed; shorter sequences are
  queried directly,
- per locus the argmax allele is kept; a strain type is reliable if at
  least one locus score >= 0.5 x that locus's average allele length;
  reliable types are resolved to an ST name via PubMLST.

TPU-native difference: all chunks of a sequence are queried as ONE
batched device call per locus instead of a Python loop of per-chunk
index searches.
"""

import json
from pathlib import Path

import numpy as np

from xspect2_tpu.core import dna
from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
from xspect2_tpu.definitions import slugify
from xspect2_tpu.io.fasta import SeqRecord, get_record_iterator
from xspect2_tpu.models.filter_model import ProbabilisticFilterModel
from xspect2_tpu.models.result import MlstResult
from xspect2_tpu.ops.query import DeviceQueryEngine

CHUNK_SCORE_THRESHOLD = 50
SPLIT_MIN_LENGTH = 10_000


class ProbabilisticFilterMlstSchemeModel(ProbabilisticFilterModel):
    """Per-locus allele filter bank for MLST strain typing."""

    def __init__(
        self,
        k: int,
        model_display_name: str,
        base_path: Path,
        scheme_url: str,
        organism: str,
        fpr: float = 0.001,
        num_hashes: int = 1,
        author: str | None = None,
        author_email: str | None = None,
        model_type: str = "MLST",
    ) -> None:
        super().__init__(
            k,
            model_display_name,
            author,
            author_email,
            model_type,
            base_path,
            fpr,
            num_hashes,
            None,
        )
        self.organism = organism
        self.scheme_url = scheme_url
        self.loci: dict[str, int] = {}
        self.avg_locus_bp_size: list[int] = []
        self.indices: list[BlockedBitSlicedIndex] = []
        self._engines: list[DeviceQueryEngine] | None = None
        self._fused_queries: dict[tuple, object] = {}

    def to_dict(self) -> dict:
        return super().to_dict() | {
            "organism": self.organism,
            "scheme_url": self.scheme_url,
            "loci": self.loci,
            "average_locus_base_pair_size": self.avg_locus_bp_size,
        }

    def slug(self) -> str:
        return slugify(
            self.organism + "-" + self.model_display_name + "-" + self.model_type
        )

    def get_locus_index_path(self, locus: str) -> Path:
        return self.base_path / self.slug() / f"{locus}.bbsi"

    # ------------------------------------------------------------------ training

    def fit(self, scheme_path: Path) -> None:
        """Build one index per locus from per-allele FASTA files."""
        if not scheme_path.exists():
            raise ValueError(
                "Scheme not found. Please make sure to download the schemes prior!"
            )

        for locus_path in sorted(scheme_path.iterdir()):
            if not locus_path.is_dir():
                continue
            locus = locus_path.name
            allele_files = sorted(
                p for p in locus_path.iterdir() if p.suffix == ".fasta"
            )
            self.loci[locus] = len(allele_files)

            first_record = next(get_record_iterator(allele_files[0]))
            self.avg_locus_bp_size.append(len(first_record.seq))

            class_names = [p.name.split(".")[0] for p in allele_files]
            max_kmers = 1
            allele_codes = []
            for p in allele_files:
                codes_parts = [
                    dna.encode(rec.seq) for rec in get_record_iterator(p)
                ]
                n = sum(max(0, len(c) - self.k + 1) for c in codes_parts)
                max_kmers = max(max_kmers, n)
                allele_codes.append(codes_parts)

            index = BlockedBitSlicedIndex.create(
                self.k,
                class_names,
                max_kmers,
                fpr=self.fpr,
                num_hashes=self.num_hashes,
            )
            for ci, codes_parts in enumerate(allele_codes):
                for codes in codes_parts:
                    hi, lo, valid = dna.canonical_kmers(codes, self.k)
                    index.insert_kmers(ci, hi, lo, valid)
            index.save(self.get_locus_index_path(locus))
            self.indices.append(index)
        self._engines = None
        self._fused_queries.clear()

    # ------------------------------------------------------------------ persistence

    def save(self) -> None:
        json_path = self.base_path / f"{self.slug()}.json"
        json_path.write_text(json.dumps(self.to_dict(), indent=4), encoding="utf-8")

    @classmethod
    def load(cls, path: Path) -> "ProbabilisticFilterMlstSchemeModel":
        if not Path(path).exists():
            raise FileNotFoundError(f"Model JSON not found at {path}")
        model_json = json.loads(Path(path).read_text(encoding="utf-8"))
        model = cls(
            model_json["k"],
            model_json["model_display_name"],
            Path(path).parent,
            model_json["scheme_url"],
            model_json["organism"],
            model_json["fpr"],
            model_json["num_hashes"],
            model_json.get("author"),
            model_json.get("author_email"),
            model_json.get("model_type"),
        )
        model.avg_locus_bp_size = model_json.get("average_locus_base_pair_size", [])
        model.loci = model_json.get("loci", {})
        for locus in model.loci:
            index_path = model.get_locus_index_path(locus)
            if not index_path.exists():
                raise FileNotFoundError(f"Index file not found at {index_path}")
            model.indices.append(BlockedBitSlicedIndex.load(index_path))
        return model

    # ------------------------------------------------------------------ inference

    @property
    def engines(self) -> list[DeviceQueryEngine]:
        if self._engines is None:
            if not self.indices:
                raise ValueError("The model has not been trained yet")
            self._engines = [DeviceQueryEngine(idx) for idx in self.indices]
        return self._engines

    def _locus_counts(
        self, engine: DeviceQueryEngine, pieces: list[str], step: int
    ) -> np.ndarray:
        """Batched per-piece hit counts against one locus index: [n_pieces, C]."""
        records = [(f"piece{i}", dna.encode(p)) for i, p in enumerate(pieces)]
        return engine.count_hits_records(records, step=step)

    def _dispatch_loci(self, sequence: str, step: int) -> list[tuple]:
        """Dispatch every locus query for one sequence WITHOUT syncing.

        Returns [(device_out, n_pieces), ...] per locus; combine any
        number of these (across loci AND across records) with
        :meth:`_fetch_counts` so the device round-trip latency is paid
        once per fetch, not once per locus or record.
        """
        if not isinstance(sequence, str):
            raise ValueError("Invalid sequence, must be a string")
        if not len(sequence) > self.k:
            raise ValueError("Invalid sequence, must be longer than k")
        if not self.indices:
            raise ValueError("The model has not been trained yet")
        use_split = len(sequence) >= SPLIT_MIN_LENGTH
        # loci whose chunk geometry coincides (equal avg allele length
        # -> identical splitter output; equal engine chunk) share ONE
        # prepared batch, whose packed device wire is cached on the
        # batch — the host->device transfer of the same genome pieces
        # is paid once instead of once per locus, ALL the group's loci
        # are queried by ONE fused device program (7 per-locus programs
        # paid 7 tunnel dispatches per genome), and the chunk-score
        # reduction runs ON DEVICE so the fetch is [C] totals per locus
        # instead of [max_records, C] raw counts — at 7 loci x 1000
        # alleles x 256 slots the raw counts were 7.2 MB/genome, ~220
        # ms of output transfer through the ~33 MB/s tunnel
        from xspect2_tpu.ops.query import (
            _next_pow2,
            make_multi_packed_query,
            packed_wire_for_batch,
            prepare_batch,
        )

        groups: dict[tuple, dict] = {}
        for li, engine in enumerate(self.engines):
            size = self.avg_locus_bp_size[li] if use_split else None
            key = (size, engine.chunk)
            if key not in groups:
                if use_split:
                    pieces = self.sequence_splitter(sequence, size)
                else:
                    pieces = [sequence]
                records = [
                    (f"piece{i}", dna.encode(p)) for i, p in enumerate(pieces)
                ]
                groups[key] = {
                    "batch": prepare_batch(
                        records, self.k, step=step, chunk=engine.chunk
                    ),
                    "n_pieces": len(records),
                    "loci": [],
                }
            groups[key]["loci"].append(li)

        dispatched: list[tuple | None] = [None] * len(self.engines)
        for group in groups.values():
            batch, n_pieces = group["batch"], group["n_pieces"]
            loci = group["loci"]
            if batch.num_records == 0:
                for li in loci:
                    out = self.engines[li].count_hits(batch, block=False)
                    dispatched[li] = (out, n_pieces)
                continue
            max_records = _next_pow2(max(8, batch.num_records))
            num_chunks = batch.num_positions // self.engines[loci[0]].chunk
            geoms = tuple(
                tuple(
                    sorted(
                        dict(
                            num_blocks=int(self.indices[li].num_blocks),
                            k=self.k,
                            num_hashes=self.indices[li].num_hashes,
                            rows_per_block=self.indices[li].rows_per_block,
                            class_words=self.indices[li].class_words,
                            num_classes=self.indices[li].num_classes,
                            chunk=self.engines[li].chunk,
                            num_chunks=num_chunks,
                            max_records=max_records,
                            fields_per_word=self.indices[li].fields_per_word,
                        ).items()
                    )
                )
                for li in loci
            )
            reduce_mode = (
                "thresholded_totals" if use_split else "first_record"
            )
            fused_key = (geoms, step, reduce_mode)
            fused = self._fused_queries.get(fused_key)
            if fused is None:
                fused = make_multi_packed_query(
                    geoms,
                    step,
                    reduce_mode=reduce_mode,
                    threshold=CHUNK_SCORE_THRESHOLD,
                )
                self._fused_queries[fused_key] = fused
            wire = packed_wire_for_batch(batch, max_records)
            outs = fused(
                tuple(self.engines[li].table for li in loci), *wire
            )
            for li, out in zip(loci, outs):
                dispatched[li] = (out, n_pieces)
        return dispatched

    def _dispatch_loci_group(self, seqs: list[str], step: int) -> list[tuple]:
        """Dispatch every locus query for a GROUP of genomes, fused.

        The per-genome cost of :meth:`_dispatch_loci` is dominated by
        the ~25 ms dispatch floor of the tunneled runtime (ops/query.py
        ``make_multi_packed_query``), so this concatenates all genomes'
        chunk records into ONE prepared batch per locus group and
        reduces per genome ON DEVICE (``thresholded_segment_totals``):
        one dispatch and one [B, C]-per-locus fetch type B genomes.
        All genomes in the group must share the >=10 kb split status
        (the caller buffers accordingly).  Returns the same
        ``dispatched`` structure :meth:`_fetch_counts` consumes, one
        entry per locus, each ``[B, C]``.
        """
        for s in seqs:
            if not isinstance(s, str):
                raise ValueError("Invalid sequence, must be a string")
            if not len(s) > self.k:
                raise ValueError("Invalid sequence, must be longer than k")
        if not self.indices:
            raise ValueError("The model has not been trained yet")
        use_split = len(seqs[0]) >= SPLIT_MIN_LENGTH
        if any((len(s) >= SPLIT_MIN_LENGTH) != use_split for s in seqs):
            raise ValueError("group must share the split status")
        n_genomes = len(seqs)
        threshold = CHUNK_SCORE_THRESHOLD if use_split else -1

        import jax.numpy as jnp

        from xspect2_tpu.ops.query import (
            _next_pow2,
            make_multi_packed_query,
            packed_wire_for_batch,
            prepare_batch,
        )

        groups: dict[tuple, dict] = {}
        for li, engine in enumerate(self.engines):
            size = self.avg_locus_bp_size[li] if use_split else None
            key = (size, engine.chunk)
            if key not in groups:
                records, seg = [], []
                for b, s in enumerate(seqs):
                    pieces = (
                        self.sequence_splitter(s, size) if use_split else [s]
                    )
                    for i, p in enumerate(pieces):
                        records.append((f"g{b}p{i}", dna.encode(p)))
                        seg.append(b)
                groups[key] = {
                    "batch": prepare_batch(
                        records, self.k, step=step, chunk=engine.chunk
                    ),
                    "seg": np.asarray(seg, dtype=np.int32),
                    "loci": [],
                }
            groups[key]["loci"].append(li)

        dispatched: list[tuple | None] = [None] * len(self.engines)
        for group in groups.values():
            batch, seg, loci = group["batch"], group["seg"], group["loci"]
            if batch.num_records == 0:  # defensive: all pieces invalid
                for li in loci:
                    zeros = np.zeros(
                        (n_genomes, self.indices[li].num_classes), np.int64
                    )
                    dispatched[li] = (zeros, n_genomes)
                continue
            max_records = _next_pow2(max(8, batch.num_records))
            num_chunks = batch.num_positions // self.engines[loci[0]].chunk
            geoms = tuple(
                tuple(
                    sorted(
                        dict(
                            num_blocks=int(self.indices[li].num_blocks),
                            k=self.k,
                            num_hashes=self.indices[li].num_hashes,
                            rows_per_block=self.indices[li].rows_per_block,
                            class_words=self.indices[li].class_words,
                            num_classes=self.indices[li].num_classes,
                            chunk=self.engines[li].chunk,
                            num_chunks=num_chunks,
                            max_records=max_records,
                            fields_per_word=self.indices[li].fields_per_word,
                        ).items()
                    )
                )
                for li in loci
            )
            fused_key = (
                geoms,
                step,
                "thresholded_segment_totals",
                threshold,
                n_genomes,
            )
            fused = self._fused_queries.get(fused_key)
            if fused is None:
                fused = make_multi_packed_query(
                    geoms,
                    step,
                    reduce_mode="thresholded_segment_totals",
                    threshold=threshold,
                    num_segments=n_genomes,
                )
                self._fused_queries[fused_key] = fused
            seg_pad = np.zeros(max_records, dtype=np.int32)
            seg_pad[: len(seg)] = seg
            wire = packed_wire_for_batch(batch, max_records)
            outs = fused(
                tuple(self.engines[li].table for li in loci),
                *wire,
                jnp.asarray(seg_pad),
            )
            for li, out in zip(loci, outs):
                dispatched[li] = (out, n_genomes)
        return dispatched

    @staticmethod
    def _fetch_counts(dispatched: list[tuple]) -> list[np.ndarray]:
        """ONE device->host transfer for any number of dispatched outputs."""
        import jax.numpy as jnp

        flat = np.asarray(
            jnp.concatenate([o.reshape(-1) for o, _ in dispatched])
        )
        offsets = np.cumsum([0] + [int(np.prod(o.shape)) for o, _ in dispatched])
        out = []
        for i, (o, n_pieces) in enumerate(dispatched):
            c = flat[offsets[i] : offsets[i + 1]].reshape(o.shape)
            if c.ndim == 2:
                # raw per-record counts: drop padded record slots
                c = c[:n_pieces]
            out.append(c.astype(np.int64))
        return out

    def calculate_hits(
        self,
        sequence: str,
        step: int = 1,
        limit: bool = False,
        limit_number: int = 5,
    ) -> list[dict]:
        """Per-locus allele scores and the argmax strain type."""
        if isinstance(sequence, SeqRecord):
            sequence = sequence.seq
        dispatched = self._dispatch_loci(sequence, step)
        counts_per_locus = self._fetch_counts(dispatched)
        return self._assemble_hits(
            sequence, counts_per_locus, limit, limit_number
        )

    def _assemble_hits(
        self,
        sequence: str,
        counts_per_locus: list[np.ndarray],
        limit: bool = False,
        limit_number: int = 5,
    ) -> list[dict]:
        """Host post-processing of fetched per-locus counts."""
        loci_names = list(self.loci.keys())
        result_dict: dict | str = {}
        highest_results: dict = {}
        any_locus_empty = False
        use_split = len(sequence) >= SPLIT_MIN_LENGTH

        for li in range(len(self.indices)):
            names = self.indices[li].class_names
            counts = counts_per_locus[li]
            if use_split:
                if counts.ndim == 2:
                    # raw per-piece counts (engine fallback path):
                    # per-chunk threshold, then sum over chunks
                    counts = np.where(
                        counts > CHUNK_SCORE_THRESHOLD, counts, 0
                    )
                    totals = counts.sum(axis=0)
                else:
                    # already reduced on device (thresholded_totals)
                    totals = counts
                order = sorted(
                    (i for i in range(len(names)) if totals[i] > 0),
                    key=lambda i: (-int(totals[i]), names[i]),
                )
                sorted_counts = {names[i]: int(totals[i]) for i in order}
                if limit:
                    sorted_counts = dict(list(sorted_counts.items())[:limit_number])
                if not sorted_counts:
                    any_locus_empty = True
                    highest_results[loci_names[li]] = {"N/A": 0}
                else:
                    first_key = next(iter(sorted_counts))
                    result_dict[loci_names[li]] = sorted_counts
                    highest_results[loci_names[li]] = {
                        first_key: sorted_counts[first_key]
                    }
            else:
                if counts.ndim == 2:
                    counts = counts[0]
                order = sorted(
                    range(len(names)), key=lambda i: (-int(counts[i]), names[i])
                )
                result = {names[i]: int(counts[i]) for i in order}
                if limit:
                    result = dict(list(result.items())[:limit_number])
                result_dict[loci_names[li]] = result
                first_key = next(iter(result))
                highest_results[loci_names[li]] = {first_key: result[first_key]}

        if any_locus_empty and not result_dict:
            result_dict = (
                "A Strain type could not be detected because of no kmer matches!"
            )

        is_valid = self.has_sufficient_score(highest_results, self.avg_locus_bp_size)
        if not is_valid:
            highest_results["Attention:"] = (
                "This strain type is not reliable due to low kmer hit rates!"
            )
        else:
            highest_results["ST_Name"] = self._resolve_strain_type(highest_results)
        return [{"Strain type": highest_results}, {"All results": result_dict}]

    def _resolve_strain_type(self, highest_results: dict) -> str:
        """Resolve the ST name via PubMLST (network); graceful offline fallback."""
        try:
            from xspect2_tpu.handlers.pubmlst import PubMLSTHandler

            flattened = {
                locus: int(next(iter(allele_id)).split("_")[-1])
                for locus, allele_id in highest_results.items()
                if isinstance(allele_id, dict)
            }
            return PubMLSTHandler().get_strain_type_name(flattened, self.scheme_url)
        except Exception as exc:  # noqa: BLE001 - network/availability errors
            return f"N/A (PubMLST lookup failed: {exc})"

    def predict(
        self,
        sequence_input,
        step: int = 1,
        limit: bool = False,
        batch_genomes: int | None = None,
    ) -> MlstResult:
        if isinstance(sequence_input, SeqRecord):
            if sequence_input.id == "<unknown id>":
                sequence_input.id = "test"
            hits = {
                sequence_input.id: self.calculate_hits(
                    sequence_input.seq, step, limit
                )
            }
            return MlstResult(self.model_display_name, step, hits, None)

        if isinstance(sequence_input, Path):
            return self.predict(
                get_record_iterator(sequence_input),
                step=step,
                limit=limit,
                batch_genomes=batch_genomes,
            )

        if hasattr(sequence_input, "__iter__"):
            # cross-GENOME fused dispatch: `batch_genomes` records'
            # chunks go through ONE device program per locus group with
            # a per-genome segment reduction on device (the [B, C]
            # fetch stays tiny), so the ~25 ms dispatch floor amortizes
            # over B genomes (tools/bench_mlst.py measures the sweep;
            # round-4's SLOWER finding was cross-record FETCH batching
            # — wide [records, C] concatenates through the tunnel —
            # which the on-device segment reduction sidesteps).  Groups
            # are flushed early if the >=10 kb split status changes so
            # every group shares one chunk geometry.  Depth-2 group
            # pipelining overlaps group N's device execution + fetch
            # with group N+1's host-side split/pack/transfer (bounded
            # depth: unbounded queues congest the link,
            # docs/performance.md).
            if batch_genomes is None:
                import os

                batch_genomes = int(
                    os.environ.get("XSPECT_MLST_BATCH_GENOMES", "4")
                )
            batch_genomes = max(1, batch_genomes)
            hits = {}
            inflight: list[tuple] = []
            buffer: list[tuple[str, str]] = []  # (record id, sequence)

            def drain_one():
                group, dispatched = inflight.pop(0)
                counts = self._fetch_counts(dispatched)
                for b, (rid, seq) in enumerate(group):
                    hits[rid] = self._assemble_hits(
                        seq, [c[b] for c in counts], limit
                    )

            def flush():
                if not buffer:
                    return
                group = list(buffer)
                buffer.clear()
                dispatched = self._dispatch_loci_group(
                    [seq for _, seq in group], step
                )
                inflight.append((group, dispatched))
                while len(inflight) >= 2:
                    drain_one()

            for record in sequence_input:
                seq = record.seq
                if buffer and (
                    (len(seq) >= SPLIT_MIN_LENGTH)
                    != (len(buffer[0][1]) >= SPLIT_MIN_LENGTH)
                ):
                    flush()
                buffer.append((record.id, seq))
                if len(buffer) >= batch_genomes:
                    flush()
            flush()
            while inflight:
                drain_one()
            return MlstResult(self.model_display_name, step, hits, None)

        raise ValueError(
            "Invalid sequence input, must be a SeqRecord, a record iterator, "
            "or a Path object to a fasta/fastq file"
        )

    # ------------------------------------------------------------------ helpers

    def sequence_splitter(self, input_sequence: str, allele_len: int) -> list[str]:
        """Split a long sequence into k-1-overlapping chunks sized by allele length."""
        sequence_len = len(input_sequence)
        if sequence_len < 1_000_000:
            substring_length = allele_len
        elif sequence_len < 10_000_000:
            substring_length = allele_len * 10
        else:
            substring_length = allele_len * 100

        substring_list = []
        start = 0
        while start + substring_length <= sequence_len:
            substring_list.append(input_sequence[start : start + substring_length])
            start += substring_length - self.k + 1
        if start < sequence_len:
            remaining = input_sequence[start:]
            if len(remaining) < self.k:
                substring_list[-1] += remaining
            else:
                substring_list.append(remaining)
        return substring_list

    def has_sufficient_score(
        self, highest_results: dict, locus_size: list[int]
    ) -> bool:
        """True if any locus argmax score >= 0.5 x its average allele length."""
        for i, allele_score_dict in enumerate(highest_results.values()):
            if not allele_score_dict:
                continue
            score = next(iter(allele_score_dict.values()))
            if score >= 0.5 * locus_size[i]:
                return True
        return False
