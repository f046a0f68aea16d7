"""Result objects.

``ModelResult`` reproduces the reference's observable result contract
(reference: src/xspect/models/result.py): per-record hits, per-record
k-mer counts, scores = ``round(hits / num_kmers, 2)`` per record plus a
``"total"`` row over summed hits/kmers, threshold/argmax filter masks,
and the JSON schema
``{model_slug, sparse_sampling_step, hits, scores, num_kmers,
misclassified, input_source, prediction?}``.

``MlstResult`` mirrors src/xspect/models/mlst_result.py.
"""

import json
from pathlib import Path


class ModelResult:
    """Per-record hit counts and derived scores for one classified input."""

    def __init__(
        self,
        model_slug: str,
        hits: dict[str, dict[str, int]],
        num_kmers: dict[str, int],
        sparse_sampling_step: int = 1,
        prediction: str | None = None,
        input_source: str | None = None,
    ):
        if "total" in hits:
            raise ValueError(
                "'total' is a reserved key and cannot be used as a subsequence"
            )
        self.model_slug = model_slug
        self.hits = hits
        self.num_kmers = num_kmers
        self.sparse_sampling_step = sparse_sampling_step
        self.prediction = prediction
        self.input_source = input_source
        # the misclassification post-filter stores its bucket under this
        # reserved key; it is serialized separately
        self.misclassified = self.hits.pop("misclassified", None)

    def get_scores(self) -> dict:
        """Scores per record and in total, rounded to two decimals."""
        scores = {
            record: {
                label: round(hit_count / self.num_kmers[record], 2)
                for label, hit_count in record_hits.items()
            }
            for record, record_hits in self.hits.items()
        }
        total_num_kmers = sum(self.num_kmers.values())
        scores["total"] = {
            label: round(hit_count / total_num_kmers, 2)
            for label, hit_count in self.get_total_hits().items()
        }
        return scores

    def get_total_hits(self) -> dict[str, int]:
        """Sum hits per label across all records."""
        first = next(iter(self.hits.values()))
        totals = {label: 0 for label in first}
        for record_hits in self.hits.values():
            for label, hit_count in record_hits.items():
                totals[label] += hit_count
        return totals

    def get_filter_mask(self, label: str, filter_threshold: float) -> dict[str, bool]:
        """Per-record boolean mask: score >= threshold (or argmax for -1)."""
        if filter_threshold < 0 and not filter_threshold == -1 or filter_threshold > 1:
            raise ValueError("The filter threshold must be between 0 and 1.")
        scores = self.get_scores()
        scores.pop("total")
        if filter_threshold != -1:
            return {
                record: record_scores[label] >= filter_threshold
                for record, record_scores in scores.items()
            }
        return {
            record: record_scores[label] == max(record_scores.values())
            for record, record_scores in scores.items()
        }

    def get_filtered_subsequence_labels(
        self, label: str, filter_threshold: float = 0.7
    ) -> list[str]:
        """Record ids passing the filter mask."""
        return [
            record
            for record, keep in self.get_filter_mask(label, filter_threshold).items()
            if keep
        ]

    def to_dict(self) -> dict:
        res = {
            "model_slug": self.model_slug,
            "sparse_sampling_step": self.sparse_sampling_step,
            "hits": self.hits,
            "scores": self.get_scores(),
            "num_kmers": self.num_kmers,
            "misclassified": self.misclassified,
            "input_source": self.input_source,
        }
        if self.prediction is not None:
            res["prediction"] = self.prediction
        return res

    def save(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        path.write_text(json.dumps(self.to_dict(), indent=4), encoding="utf-8")


class MlstResult:
    """MLST result wrapper: {Scheme, Steps, Results, Input_source}."""

    def __init__(
        self,
        scheme: str,
        steps: int,
        hits: dict[str, list[dict]],
        input_source: str | None = None,
    ):
        self.scheme = scheme
        self.steps = steps
        self.hits = hits
        self.input_source = input_source

    def get_results(self) -> dict:
        return self.hits

    def to_dict(self) -> dict:
        return {
            "Scheme": self.scheme,
            "Steps": self.steps,
            "Results": self.get_results(),
            "Input_source": self.input_source,
        }

    def save(self, output_path: Path | str) -> None:
        output_path = Path(output_path)
        output_path.parent.mkdir(exist_ok=True, parents=True)
        output_path.write_text(json.dumps(self.to_dict(), indent=4), encoding="utf-8")
