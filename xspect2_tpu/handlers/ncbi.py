"""NCBI Datasets v2 REST client.

Same surface and behavior as the reference handler
(reference: src/xspect/handlers/ncbi.py): rate limiting (5 rps, 10 rps
with API key), genus-taxid validation (rank GENUS, bacteria lineage),
species subtree listing, quality-ranked accession selection walking
assembly levels reference -> complete -> chromosome -> scaffold ->
contig with N50/atypical/ANI filters, bulk zip download, and single
reference-genome download per taxid.

Network access is required; all methods raise normally on failure so
callers can gate/degrade (the misclassification pipeline skips groups
whose reference cannot be fetched).
"""

import logging
import shutil
import time
import zipfile
from enum import Enum
from pathlib import Path

import requests

logger = logging.getLogger("xspect2_tpu.ncbi")


class AssemblyLevel(Enum):
    """Assembly quality levels, best first."""

    REFERENCE = "reference"
    COMPLETE_GENOME = "complete_genome"
    CHROMOSOME = "chromosome"
    SCAFFOLD = "scaffold"
    CONTIG = "contig"


class AssemblySource(Enum):
    """Assembly database source."""

    REFSEQ = "refseq"
    GENBANK = "genbank"


class NCBIHandler:
    """Client for taxa metadata and assembly downloads from NCBI Datasets."""

    def __init__(self, api_key: str | None = None):
        self.api_key = api_key
        self.base_url = "https://api.ncbi.nlm.nih.gov/datasets/v2"
        self.last_request_time = 0.0
        # NCBI allows 10 rps with an API key, otherwise 5 rps
        self.min_interval = 1 / 10 if api_key else 1 / 5

    def _enforce_rate_limit(self) -> None:
        now = time.time()
        elapsed = now - self.last_request_time
        if elapsed < self.min_interval:
            time.sleep(self.min_interval - elapsed)
        self.last_request_time = now

    def _make_request(self, endpoint: str, timeout: int = 15) -> dict:
        self._enforce_rate_limit()
        endpoint = endpoint if endpoint.startswith("/") else "/" + endpoint
        headers = {"api-key": self.api_key} if self.api_key else {}
        response = requests.get(
            self.base_url + endpoint, headers=headers, timeout=timeout
        )
        response.raise_for_status()
        return response.json()

    # ------------------------------------------------------------------ taxonomy

    def get_genus_taxon_id(self, genus: str) -> int:
        """Validate a genus name and return its taxon id (must be a
        bacterial GENUS-rank taxon)."""
        response = self._make_request(f"/taxonomy/taxon/{genus}")
        try:
            taxonomy = response["taxonomy_nodes"][0]["taxonomy"]
            if taxonomy["rank"] != "GENUS":
                raise ValueError(f"Genus name {genus} is not a genus.")
            if taxonomy["lineage"][2] != 2:
                raise ValueError(f"Genus name {genus} does not belong to bacteria.")
            return taxonomy["tax_id"]
        except (IndexError, KeyError, TypeError) as e:
            raise ValueError(f"Invalid genus name: {genus}") from e

    def get_species(self, genus_id: int) -> list[int]:
        """Species taxon ids of a genus (visible children of the subtree)."""
        response = self._make_request(
            f"/taxonomy/taxon/{genus_id}/filtered_subtree"
        )
        try:
            return response["edges"][str(genus_id)]["visible_children"]
        except (IndexError, KeyError, TypeError) as e:
            raise ValueError(f"Invalid genus id: {genus_id}") from e

    def get_taxon_names(self, taxon_ids: list[int]) -> dict[int, str]:
        """Organism names for up to 1000 taxon ids."""
        if len(taxon_ids) > 1000:
            raise ValueError("Maximum number of taxon ids is 1000.")
        if len(taxon_ids) < 1:
            raise ValueError("At least one taxon id is required.")

        response = self._make_request(
            f"/taxonomy/taxon/{','.join(map(str, taxon_ids))}?page_size=1000"
        )
        try:
            names = {
                int(node["taxonomy"]["tax_id"]): node["taxonomy"]["organism_name"]
                for node in response["taxonomy_nodes"]
            }
            if len(names) != len(taxon_ids):
                raise ValueError("Not all taxon ids were found.")
            return names
        except (IndexError, KeyError, TypeError) as e:
            raise ValueError(f"Invalid taxon ids: {taxon_ids}") from e

    # ------------------------------------------------------------------ assemblies

    def get_accessions(
        self,
        taxon_id: int,
        assembly_level: AssemblyLevel,
        assembly_source: AssemblySource,
        count: int,
        min_n50: int,
        exclude_atypical: bool,
        allow_inconclusive: bool,
        exclude_paired_reports: bool = True,
        current_version_only: bool = True,
    ) -> list[str]:
        """Accessions of one assembly level, filtered by N50 and ANI status."""
        endpoint = (
            f"/genome/taxon/{taxon_id}/dataset_report?"
            f"filters.tax_exact_match=false&"
            f"filters.assembly_source={assembly_source.value}&"
            f"filters.exclude_atypical={exclude_atypical}&"
            f"filters.exclude_paired_reports={exclude_paired_reports}&"
            f"filters.current_version_only={current_version_only}&"
            f"page_size={count * 2}&"  # headroom for N50/ANI-filtered entries
        )
        endpoint += (
            "filters.reference_only=true&"
            if assembly_level == AssemblyLevel.REFERENCE
            else f"filters.assembly_level={assembly_level.value}"
        )

        response = self._make_request(endpoint)
        try:
            accessions = [
                report["accession"]
                for report in response["reports"]
                if report["assembly_stats"]["contig_n50"] >= min_n50
                and (
                    allow_inconclusive
                    or report["average_nucleotide_identity"]["taxonomy_check_status"]
                    == "OK"
                )
            ]
        except (IndexError, KeyError, TypeError):
            logger.debug(
                "Could not get %s accessions for taxon %s. Skipping.",
                assembly_level.value,
                taxon_id,
            )
            return []
        return accessions[:count]

    def get_highest_quality_accessions(
        self,
        taxon_id: int,
        assembly_source: AssemblySource,
        count: int,
        min_n50: int,
        exclude_atypical: bool,
        allow_inconclusive: bool,
    ) -> list[str]:
        """Walk assembly levels best-first until ``count`` unique accessions."""
        accessions: list[str] = []
        for assembly_level in list(AssemblyLevel):
            accessions += self.get_accessions(
                taxon_id,
                assembly_level,
                assembly_source,
                count,
                min_n50=min_n50,
                exclude_atypical=exclude_atypical,
                allow_inconclusive=allow_inconclusive,
            )
            if len(set(accessions)) >= count:
                break
        # deduplicate, preserving quality order
        unique = list(dict.fromkeys(accessions))
        return unique[:count]

    def download_assemblies(self, accessions: list[str], output_dir: Path) -> None:
        """Download the genome FASTA zip for the given accessions."""
        endpoint = (
            f"/genome/accession/{','.join(accessions)}/download"
            "?include_annotation_type=GENOME_FASTA"
        )
        self._enforce_rate_limit()
        response = requests.get(self.base_url + endpoint, stream=True, timeout=15)
        response.raise_for_status()

        output_dir.mkdir(parents=True, exist_ok=True)
        with open(output_dir / "ncbi_dataset.zip", "wb") as f:
            for chunk in response.iter_content(chunk_size=8192):
                f.write(chunk)

    def download_reference_genome(self, taxon_id: int, output_dir: Path) -> Path | None:
        """Download the RefSeq reference genome for a taxon as <taxid>.fna."""
        accessions = self.get_accessions(
            taxon_id=taxon_id,
            assembly_level=AssemblyLevel.REFERENCE,
            assembly_source=AssemblySource.REFSEQ,
            count=1,
            min_n50=0,
            exclude_atypical=True,
            allow_inconclusive=False,
        )
        if not accessions:
            return None

        logger.info(
            "Downloading reference genome for taxon %s: %s", taxon_id, accessions[0]
        )
        self.download_assemblies(accessions, output_dir)

        zip_path = output_dir / "ncbi_dataset.zip"
        fna_file: Path | None = None
        with zipfile.ZipFile(zip_path, "r") as zip_ref:
            for file in zip_ref.namelist():
                if file.endswith(".fna"):
                    extracted_path = zip_ref.extract(file, path=output_dir)
                    fna_file = output_dir / f"{taxon_id}.fna"
                    Path(extracted_path).rename(fna_file)
                    break

        zip_path.unlink()
        shutil.rmtree(output_dir / "ncbi_dataset", ignore_errors=True)
        return fna_file
