"""AMES mutagenicity dataset loader.

As with METLIN_SMRT, the reference advertises this loader but the file is
missing from its checkout; reconstructed as a CSV loader for the
Hansen et al. (2009) Ames mutagenicity benchmark (SMILES + binary
mutagenicity labels).
"""
import pandas as pd

from ._get import get


def AMES(
    download_url=(
        'https://doc.ml.tu-berlin.de/toxbenchmark/'
        'Mutagenicity_N6512.csv'
    ),
    local_filename='ames.csv', overwrite=False
):
    """Ames bacterial mutagenicity benchmark (~6.5k molecules).

    Returns
    -------
    pandas.DataFrame with SMILES strings and mutagenicity labels as
    distributed.
    """
    f = get(download_url, local_filename, overwrite=overwrite)
    try:
        df = pd.read_csv(f)
    except Exception as e:
        raise RuntimeError(
            f'Loading {local_filename} failed due to error: {e}.'
        )
    return df
