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
from xspect2_tpu.io.fasta import get_record_iterator
from xspect2_tpu.models.filter_model import ProbabilisticFilterModel


def _optimal_num_hashes(fpr: float) -> int:
    return max(1, round(-math.log2(fpr)))


class ProbabilisticSingleFilterModel(ProbabilisticFilterModel):
    """Genus-level single Bloom-filter model."""

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

    def get_index_path(self) -> Path:
        return self.base_path / self.slug() / "filter.bbsi"

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
        )

    @classmethod
    def load(cls, path: Path) -> "ProbabilisticSingleFilterModel":
        model_json = json.loads(Path(path).read_text(encoding="utf-8"))
        model = cls._from_metadata(model_json, Path(path).parent)
        model.display_names = model_json["display_names"]
        index_path = model.get_index_path()
        if not index_path.exists():
            raise FileNotFoundError(f"Filter file not found at {index_path}")
        model.index = BlockedBitSlicedIndex.load(index_path)
        return model
