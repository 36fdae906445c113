"""Chemistry profiles for nanopore signal digitisation.

Values and semantics match the reference profile tables
(src/seq2squiggle/utils.py:129-263 and signal_io.py:26-60): each profile
carries the digitisation parameters used to convert pA currents to raw
int16 ADC values plus per-read offset/median_before statistics, and forces
the k-mer size appropriate to the chemistry.
"""

from __future__ import annotations

import logging

logger = logging.getLogger("seq2squiggle_tpu")

PROFILES: dict = {
    "dna-r10-min": {
        "digitisation": 8192,
        "sample_rate": 5000,
        "bps": 400,
        "range": 1536.598389,
        "offset_mean": 13.380569389019,
        "offset_std": 16.311471649012,
        "median_before_mean": 202.15407438804,
        "median_before_std": 13.406139241768,
    },
    "dna-r10-prom": {
        "digitisation": 2048,
        "sample_rate": 5000,
        "bps": 400,
        "range": 281.345551,
        "offset_mean": -127.5655735,
        "offset_std": 19.377283387665,
        "median_before_mean": 189.87607393756,
        "median_before_std": 15.788097978713,
    },
    "dna-r9-min": {
        "digitisation": 8192,
        "sample_rate": 4000,
        "bps": 450,
        "range": 1443.030273,
        "offset_mean": 13.7222605,
        "offset_std": 10.25279688,
        "median_before_mean": 200.815801,
        "median_before_std": 20.48933762,
    },
    "dna-r9-prom": {
        "digitisation": 2048,
        "sample_rate": 4000,
        "bps": 450,
        "range": 748.5801,
        "offset_mean": -237.4102,
        "offset_std": 14.1575,
        "median_before_mean": 214.2890337,
        "median_before_std": 18.0127916,
    },
    "rna-004-min": {
        "digitisation": 8192,
        "sample_rate": 4000,
        "bps": 130,
        "range": 1437.976685,
        "offset_mean": 12.47686423863,
        "offset_std": 10.442126577137,
        "median_before_mean": 205.08496731088,
        "median_before_std": 8.6671292866233,
    },
    "rna-004-prom": {
        "digitisation": 2048,
        "sample_rate": 4000,
        "bps": 130,
        "range": 299.432068,
        "offset_mean": -259.421128,
        "offset_std": 16.010841823643,
        "median_before_mean": 189.87607393756,
        "median_before_std": 15.788097978713,
    },
}

# Sequencing-kit / flow-cell header metadata per chemistry
# (reference: signal_io.py:26-60).
_KIT_FLOWCELL = {
    "rna-004": {"seq_kit": "sqk-rna004", "prom": "FLO-PRO004RA", "min": "FLO-MIN004RA"},
    "rna-002": {"seq_kit": "sqk-rna002", "prom": "FLO-PRO002", "min": "FLO-MIN106"},
    "dna-r10": {"seq_kit": "SQK-LSK114", "prom": "FLO-PRO114", "min": "FLO-MIN114"},
    "dna-r9": {"seq_kit": "SQK-LSK109", "prom": "FLO-PRO001", "min": "FLO-MIN110"},
}


def get_profile(profile: str) -> dict:
    """Return a copy of the named chemistry profile dict."""
    if profile not in PROFILES:
        logger.error(f"Incorrect value for profile: {profile}")
        raise ValueError(f"Incorrect value for profile: {profile}")
    return dict(PROFILES[profile])


def update_profile(profile_dict: dict, **kwargs) -> dict:
    """Override profile fields with any non-None CLI values."""
    for key, value in kwargs.items():
        if value is not None and key in profile_dict:
            profile_dict[key] = value
        elif key not in profile_dict:
            logger.warning(f"Warning: {key} is not a valid key in the profile")
    return profile_dict


def update_config_for_profile(profile_name: str, config: dict) -> dict:
    """Force seq_kmer based on chemistry: 9 for R10/RNA004, 6 for R9."""
    if profile_name.startswith("dna-r10") or profile_name.startswith("rna-004"):
        config["seq_kmer"] = 9
    elif profile_name.startswith("dna-r9"):
        config["seq_kmer"] = 6
    else:
        raise ValueError(
            f"Unsupported profile name: {profile_name}. "
            "Expected 'dna-r10' or 'dna-r9' prefix."
        )
    return config


def get_seq_kit_and_flow_cell(profile_name: str):
    """Return (sequencing_kit, flow_cell_product_code) for header metadata."""
    for prefix, data in _KIT_FLOWCELL.items():
        if profile_name.startswith(prefix):
            if "prom" in profile_name:
                return data["seq_kit"], data["prom"]
            if "min" in profile_name:
                return data["seq_kit"], data["min"]
            break
    raise ValueError(f"Unsupported profile name: {profile_name}")
