"""The Rajagopal 2015 full-body human model + ANSUR anthropometrics.

Reference parity: python/nimblephysics/models/rajagopal.py, which ships
Rajagopal2015.osim (23 bodies, 39 coordinates incl. the knee_angle_*_beta
patella couplers), the ANSUR II public CSVs, and
ANSUR_Rajagopal_metrics.xml as package data and exposes

    RajagopalHumanBodyModel() -> parsed OpenSim model
    RajagopalANSURModel()     -> Anthropometrics with the ANSUR Gaussian

We do NOT vendor the (large, third-party-licensed) data files; they are
located at import time from, in order:
  1. $NIMBLE_RAJAGOPAL_DATA (a directory holding Rajagopal2015.osim etc.),
  2. an installed `nimblephysics` pip package's models/rajagopal_data,
  3. the reference checkout under /root/reference (dev environments).
When no data is available, `rajagopal_humanoid()` (models/human.py) is
the programmatic no-data fallback and `RajagopalHumanBodyModel()` raises
with instructions.
"""

from __future__ import annotations

import os
from typing import List, Optional

_DATA_FILES = (
    "Rajagopal2015.osim",
    "ANSUR_Rajagopal_metrics.xml",
    "ANSUR_II_MALE_Public.csv",
    "ANSUR_II_FEMALE_Public.csv",
)


def rajagopal_data_dir() -> Optional[str]:
    """Directory holding the Rajagopal model data, or None."""
    candidates: List[str] = []
    env = os.environ.get("NIMBLE_RAJAGOPAL_DATA")
    if env:
        candidates.append(env)
    try:  # an installed reference wheel shares the same data layout
        import nimblephysics  # type: ignore

        candidates.append(
            os.path.join(
                os.path.dirname(nimblephysics.__file__),
                "models", "rajagopal_data",
            )
        )
    except Exception:
        pass
    candidates.append(
        "/root/reference/python/nimblephysics/models/rajagopal_data"
    )
    for c in candidates:
        if os.path.isfile(os.path.join(c, _DATA_FILES[0])):
            return c
    return None


def RajagopalHumanBodyModel():
    """Parse the real Rajagopal2015.osim (reference:
    models/rajagopal.py RajagopalHumanBodyModel -> OpenSimParser.parseOsim).

    Returns a biomechanics.OpenSimFile: .skeleton (22 bodies, 39 dofs with
    the two knee patella couplers), .markers (66), coordinate mappings.
    """
    data = rajagopal_data_dir()
    if data is None:
        raise FileNotFoundError(
            "Rajagopal2015.osim not found. Point $NIMBLE_RAJAGOPAL_DATA at "
            "a directory containing the rajagopal_data files (shipped with "
            "the reference nimblephysics wheel), or use "
            "models.rajagopal_humanoid() for the programmatic fallback."
        )
    from nimblephysics_tpu.biomechanics.opensim_parser import parse_osim

    return parse_osim(
        os.path.join(data, "Rajagopal2015.osim"),
        geometry_folder=os.path.join(data, "Geometry"),
    )


def RajagopalANSURModel(sex: str = "male", units: float = 0.001):
    """ANSUR II anthropometric prior bound to the Rajagopal skeleton.

    Reference: models/rajagopal.py RajagopalANSURModel — loads the metric
    definitions from ANSUR_Rajagopal_metrics.xml, fits a
    MultivariateGaussian to the ANSUR II CSV over metricNames + Age +
    Weightlbs + Heightin (units=0.001: mm -> m for the length columns),
    and attaches it. Condition on {"Age": .., "Weightlbs": ..,
    "Heightin": ..} before evaluating log_pdf.
    """
    data = rajagopal_data_dir()
    if data is None:
        raise FileNotFoundError(
            "ANSUR data not found (see RajagopalHumanBodyModel)."
        )
    from nimblephysics_tpu.biomechanics.anthropometrics import (
        Anthropometrics,
        MultivariateGaussian,
    )

    anthro = Anthropometrics.load_from_file(
        os.path.join(data, "ANSUR_Rajagopal_metrics.xml")
    )
    cols = anthro.get_metric_names() + ["Age", "Weightlbs", "Heightin"]
    csv_name = (
        "ANSUR_II_MALE_Public.csv"
        if sex.lower().startswith("m")
        else "ANSUR_II_FEMALE_Public.csv"
    )
    dist = MultivariateGaussian.load_from_csv(
        os.path.join(data, csv_name), cols, units
    )
    anthro.set_distribution(dist)
    return anthro
