"""PubMLST REST client.

Same surface as the reference handler
(reference: src/xspect/handlers/pubmlst.py): list seqdef organisms,
list schemes, resolve scheme URLs, download all allele FASTAs per locus
(one ``Allele_ID_<n>.fasta`` per allele, resuming by skipping existing
files), and resolve allele designations to a strain-type name via POST.
"""

from pathlib import Path

import requests

from xspect2_tpu.file_io import create_fasta_files


class PubMLSTHandler:
    """Client for PubMLST scheme/allele data and strain-type lookup."""

    def __init__(self, base_url: str = "https://rest.pubmlst.org/db"):
        self.base_url = base_url

    def get_available_organisms(self) -> list:
        """Organism names that have a seqdef database."""
        available = []
        for species_databases in requests.get(self.base_url, timeout=10).json():
            for database in species_databases["databases"]:
                if database["name"].endswith("seqdef"):
                    available.append(database["name"].split("_")[1])
        return available

    def get_available_schemes(self, species: str) -> list:
        """Scheme descriptions for one organism."""
        scheme_url = f"{self.base_url}/pubmlst_{species}_seqdef/schemes"
        return [
            scheme["description"]
            for scheme in requests.get(scheme_url, timeout=10).json()["schemes"]
        ]

    def get_scheme_url(self, species: str, scheme: str) -> str:
        """Resolve a scheme description to its REST URL."""
        scheme_url = f"{self.base_url}/pubmlst_{species}_seqdef/schemes"
        for entry in requests.get(scheme_url, timeout=10).json()["schemes"]:
            if entry["description"] == scheme:
                return f"{entry['scheme']}"
        raise ValueError(f"Scheme '{scheme}' not found for species '{species}'.")

    def download_alleles(self, species: str, scheme: str, scheme_path: Path) -> None:
        """Download every allele FASTA of every locus of a scheme."""
        scheme_url = self.get_scheme_url(species, scheme)
        scheme_json = requests.get(scheme_url, timeout=10).json()

        for locus_url in scheme_json["loci"]:
            locus_name = locus_url.split("/")[-1]
            locus_path = scheme_path / locus_name
            locus_path.mkdir(exist_ok=True, parents=True)
            alleles = requests.get(f"{locus_url}/alleles_fasta", timeout=10).text
            create_fasta_files(locus_path, alleles)

    def get_strain_type_name(self, highest_results: dict, post_url: str) -> str:
        """POST allele designations; returns the ST fields or an explanation."""
        payload = {
            "designations": {
                locus: [{"allele": str(allele)}]
                for locus, allele in highest_results.items()
            }
        }
        response = requests.post(post_url + "/designations", json=payload, timeout=10)

        if response.status_code == 200:
            data = response.json()
            if "fields" in data:
                return data["fields"]
            return (
                "No matching Strain Type found in the database. "
                "Possibly a novel Strain Type."
            )
        return "Error:" + str(response.status_code) + response.text
