"""Single-filter (genus) model.

One Bloom-filter column holding the canonical k-mers of a whole-genus
metagenome (reference: src/xspect/models/probabilistic_single_filter_model.py).
The reference uses rbloom + xxh3 over ASCII k-mer strings; here the same
single column is one class of the blocked bit-sliced index so the genus
path shares the device query engine.  The number of probe hashes is
chosen optimally from the false-positive rate (the reference's rbloom
does the same internally)."""

import json
import math
from pathlib import Path

from xspect2_tpu.core import dna
from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
from xspect2_tpu.core.compat import XXH3BloomFilter
from xspect2_tpu.io.fasta import get_record_iterator
from xspect2_tpu.models.filter_model import ProbabilisticFilterModel
from xspect2_tpu.models.result import ModelResult


def _optimal_num_hashes(fpr: float) -> int:
    return max(1, round(-math.log2(fpr)))


class ProbabilisticSingleFilterModel(ProbabilisticFilterModel):
    """Genus-level single Bloom-filter model.

    ``hash_family`` selects the filter implementation:

    - ``"blocked"`` (default, the throughput path): one class column of
      the blocked bit-sliced index, queried by the shared device engine.
    - ``"xxh3"``: the reference-hash-family compat mode
      (core/compat.py) — XXH3-64 over the ASCII canonical k-mer string,
      exactly the byte stream the reference's rbloom filter hashes
      (reference: src/xspect/models/probabilistic_single_filter_model.py:88,157).
      Host hashing + device bit tests; a parity/verification mode.
    """

    def __init__(
        self,
        k: int,
        model_display_name: str,
        author: str | None,
        author_email: str | None,
        model_type: str,
        base_path: Path,
        fpr: float = 0.01,
        training_accessions: list[str] | None = None,
        hash_family: str = "blocked",
    ) -> None:
        super().__init__(
            k=k,
            model_display_name=model_display_name,
            author=author,
            author_email=author_email,
            model_type=model_type,
            base_path=base_path,
            fpr=fpr,
            num_hashes=1,  # metadata-schema parity with the reference
            training_accessions=training_accessions,
        )
        if hash_family not in ("blocked", "xxh3"):
            raise ValueError(f"unknown hash_family: {hash_family!r}")
        self.hash_family = hash_family
        self.compat_filter: XXH3BloomFilter | None = None

    def get_index_path(self) -> Path:
        if self.hash_family == "xxh3":
            return self.base_path / self.slug() / "filter.xxh3.npz"
        return self.base_path / self.slug() / "filter.bbsi"

    def to_dict(self) -> dict:
        d = super().to_dict()
        if self.hash_family != "blocked":
            d["hash_family"] = self.hash_family
        return d

    def fit(
        self,
        file_path: Path,
        display_name: str,
        training_accessions: list[str] | None = None,
    ) -> None:
        """Insert all canonical k-mers of the metagenome file into the filter."""
        self.training_accessions = training_accessions

        total_length = 0
        for record in get_record_iterator(file_path):
            total_length += len(record.seq)
        num_kmers = max(1, total_length - self.k + 1)

        if self.hash_family == "xxh3":
            # reference-hash-family compat filter, sized like Bloom(n, fpr)
            filt = XXH3BloomFilter.for_items(num_kmers, self.fpr, self.k)
            for record in get_record_iterator(file_path):
                filt.insert_sequence(str(record.seq))
            self.compat_filter = filt
            self.display_names[file_path.stem] = display_name
            filt.save(self.get_index_path())
            return

        # auto probe count: fewer probes = fewer device passes at equal
        # fpr (the classic optimum only minimizes table SIZE; genus
        # filters are single-class so field packing already makes them
        # 32x denser — see core/blocked_index.py::pick_num_hashes)
        index = BlockedBitSlicedIndex.create(
            self.k,
            [file_path.stem],
            num_kmers,
            fpr=self.fpr,
            num_hashes=None,
        )
        from xspect2_tpu import native

        if native.available():
            codes, offsets, _ids = native.parse_file(file_path)
            for r in range(len(offsets) - 1):
                native.insert_kmers(index, 0, codes[offsets[r] : offsets[r + 1]])
        else:
            for record in get_record_iterator(file_path):
                hi, lo, valid = dna.canonical_kmers(
                    dna.encode(record.seq), self.k
                )
                index.insert_kmers(0, hi, lo, valid)

        self.index = index
        self._engine = None
        self.display_names[file_path.stem] = display_name
        index.save(self.get_index_path())

    # ------------------------------------------------- xxh3 compat mode
    def _compat_class_name(self) -> str:
        # single-class model: the one trained metagenome's file stem
        return next(iter(self.display_names), "metagenome")

    def calculate_hits(
        self, sequence, exclude_ids: list[str] | None = None, step: int = 1
    ) -> dict:
        if self.compat_filter is None:
            return super().calculate_hits(sequence, exclude_ids, step=step)
        seq = sequence.seq if hasattr(sequence, "seq") else sequence
        if not isinstance(seq, str):
            seq = str(seq)
        if not len(seq) > self.k:
            raise ValueError("Invalid sequence, must be longer than k")
        hi, lo, valid = dna.canonical_kmers(dna.encode(seq), self.k, step=step)
        name = self._compat_class_name()
        if exclude_ids and name in exclude_ids:
            return {}
        return {name: self.compat_filter.count_hits_device(hi, lo, valid)}

    def predict(
        self,
        sequence_input,
        exclude_ids: list[str] | None = None,
        step: int = 1,
        display_name: bool = False,
        validation: bool = False,
    ) -> ModelResult:
        if self.compat_filter is None:
            return super().predict(
                sequence_input, exclude_ids, step, display_name, validation
            )
        hits: dict[str, dict[str, int]] = {}
        num_kmers: dict[str, int] = {}
        kept_records = [] if validation else None
        for rec in self._as_record_iterable(sequence_input):
            rec_hits = self.calculate_hits(rec, exclude_ids, step=step)
            if display_name:
                rec_hits = {
                    f"{key} -{self.display_names.get(key, 'Unknown').replace(self.model_display_name, '', 1)}": v
                    for key, v in rec_hits.items()
                }
            hits[rec.id] = rec_hits
            num_kmers[rec.id] = self._count_kmers(str(rec.seq), step=step)
            if validation:
                kept_records.append(rec)
        if not hits:
            raise ValueError("No sequences found in input")
        if validation:
            hits = self.detecting_misclassification(hits, kept_records)
        return ModelResult(self.slug(), hits, num_kmers, sparse_sampling_step=step)

    # ------------------------------------------------------- persistence
    @classmethod
    def _from_metadata(cls, model_json: dict, base_path: Path):
        return cls(
            model_json["k"],
            model_json["model_display_name"],
            model_json["author"],
            model_json["author_email"],
            model_json["model_type"],
            base_path,
            fpr=model_json["fpr"],
            training_accessions=model_json["training_accessions"],
            hash_family=model_json.get("hash_family", "blocked"),
        )

    @classmethod
    def load(cls, path: Path) -> "ProbabilisticSingleFilterModel":
        model_json = json.loads(Path(path).read_text(encoding="utf-8"))
        model = cls._from_metadata(model_json, Path(path).parent)
        model.display_names = model_json["display_names"]
        index_path = model.get_index_path()
        if not index_path.exists():
            raise FileNotFoundError(f"Filter file not found at {index_path}")
        if model.hash_family == "xxh3":
            model.compat_filter = XXH3BloomFilter.load(index_path)
        else:
            model.index = BlockedBitSlicedIndex.load(index_path)
        return model
