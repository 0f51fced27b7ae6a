#!/usr/bin/env python3
"""Fetch the RFMIP RAD-IRF input + CMIP flux-template files.

Python counterpart of the reference's download-data-files.sh
(/root/reference/download-data-files.sh:1-25): downloads the CMIP6 RFMIP
100-site atmosphere file and the four CMIP output-template files from the
RTE-RRTMGP continuous-integration archive, renaming the templates from
``RTE-RRTMGP-181204`` to ``RTE-ecckd`` exactly like the reference script.

Two deliberate improvements over the bash original:

* the template files are ALSO kept under their original names
  (``*_RTE-RRTMGP-181204_*``): their variable payloads are RTE-RRTMGP's own
  CI reference fluxes, i.e. an independent external validation anchor for
  tests/test_realdata.py — the reference's de-facto integration test
  compares against exactly these artifacts (SURVEY.md section 4);
* each file's sha256 is computed after download and checked against the
  pinned table below when an entry is present (first successful download
  prints the digest to pin).

Offline behavior: exits 1 with a clear message; tests auto-skip when the
files are absent (tests/test_realdata.py).

Usage:  python tools/download_data.py [--dest DIR]
"""
from __future__ import annotations

import argparse
import hashlib
import shutil
import sys
import urllib.request
from pathlib import Path

BASE = ("ftp://ftp.ldeo.columbia.edu/pub/robertp/rte-rrtmgp/"
        "continuous-integration/")

RFMIP_INPUT = ("multiple_input4MIPs_radiation_RFMIP_"
               "UColorado-RFMIP-1-2_none.nc")
TEMPLATES = [
    "rld_Efx_RTE-RRTMGP-181204_rad-irf_r1i1p1f1_gn.nc",
    "rlu_Efx_RTE-RRTMGP-181204_rad-irf_r1i1p1f1_gn.nc",
    "rsd_Efx_RTE-RRTMGP-181204_rad-irf_r1i1p1f1_gn.nc",
    "rsu_Efx_RTE-RRTMGP-181204_rad-irf_r1i1p1f1_gn.nc",
]

# BASELINE config 3's second ckd file — absent from the reference
# snapshot (/root/reference/.MISSING_LARGE_BLOBS:1), only recoverable
# over the network.  Upstream ships it IN-REPO (earth-system-radiation/
# rte-ecckd data/), so the candidates are the GitHub raw/LFS endpoints
# for that path on either default-branch name.
CKD_MISSING = "ecckd-1.2_lw_ckd-definition_climate_rrtmgp-tol0.0161.nc"
CKD_URLS = [
    ("https://media.githubusercontent.com/media/earth-system-radiation/"
     f"rte-ecckd/{branch}/data/{CKD_MISSING}")
    for branch in ("main", "master")
] + [
    ("https://raw.githubusercontent.com/earth-system-radiation/"
     f"rte-ecckd/{branch}/data/{CKD_MISSING}")
    for branch in ("main", "master")
]

# sha256 digests, pinned after the first successful download (None =>
# unverified; the script prints the digest so it can be pinned here).
SHA256: dict[str, str | None] = {
    RFMIP_INPUT: None,
    CKD_MISSING: None,
    **{t: None for t in TEMPLATES},
}


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch(name: str, dest: Path, urls=None) -> Path:
    out = dest / name
    if out.exists():
        print(f"  {name}: already present")
    else:
        errors = []
        for url in (urls or [BASE + name]):
            print(f"  {name}: fetching {url}")
            tmp = out.with_suffix(".part")
            try:
                with urllib.request.urlopen(url, timeout=120) as r, \
                        open(tmp, "wb") as f:
                    shutil.copyfileobj(r, f)
                tmp.rename(out)
                break
            except Exception as e:
                tmp.unlink(missing_ok=True)
                errors.append(f"{url}: {type(e).__name__}: {e}")
        else:
            raise RuntimeError(f"download failed for {name}: "
                               + "; ".join(errors))
    digest = _sha256(out)
    pinned = SHA256.get(name)
    if pinned is None:
        print(f"    sha256 {digest}  (unpinned — add to SHA256 to pin)")
    elif digest != pinned:
        raise RuntimeError(f"checksum mismatch for {name}: "
                           f"{digest} != pinned {pinned}")
    else:
        print(f"    sha256 OK")
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dest", default="data/rfmip", type=Path,
                    help="destination directory (default: data/rfmip)")
    ap.add_argument("--require-pinned", action="store_true",
                    help="fail if any file lacks a pinned sha256 (CI "
                         "integrity mode: files arrive over plain FTP, so "
                         "an unpinned fetch is unauthenticated)")
    args = ap.parse_args(argv)
    if args.require_pinned:
        unpinned = [n for n, d in SHA256.items() if d is None]
        if unpinned:
            print("ERROR: --require-pinned set but no pinned sha256 for: "
                  + ", ".join(unpinned)
                  + "\n(run once on a networked, trusted host and pin the "
                    "printed digests in SHA256)", file=sys.stderr)
            return 2
    dest: Path = args.dest
    dest.mkdir(parents=True, exist_ok=True)

    print(f"Downloading RFMIP RAD-IRF data into {dest}/")
    try:
        fetch(RFMIP_INPUT, dest)
        fetch(CKD_MISSING, dest, urls=CKD_URLS)
        for t in TEMPLATES:
            src = fetch(t, dest)
            # The reference renames templates to RTE-ecckd for the drivers
            # to fill (download-data-files.sh:8-21); keep the RRTMGP
            # original too — it is the independent flux anchor.
            ecckd = dest / t.replace("RTE-RRTMGP-181204", "RTE-ecckd")
            if not ecckd.exists():
                shutil.copyfile(src, ecckd)
                print(f"    -> {ecckd.name}")
    except RuntimeError as e:
        print(f"ERROR: {e}\n(no network in this environment? tests that "
              f"need these files auto-skip)", file=sys.stderr)
        return 1
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
