"""METLIN-SMRT dataset loader.

The reference's ``graphdot/dataset/__init__.py`` imports this module but
the file is absent from its checkout (SURVEY.md §2, L10 note); the loader
is reconstructed here from the published dataset: the METLIN small-molecule
retention-time dataset (Domingo-Almenara et al., Nature Communications
2019), distributed as a CSV of PubChem CID / SMILES / retention time.
"""
import pandas as pd

from ._get import get


def METLIN_SMRT(
    download_url='https://ndownloader.figshare.com/files/18130628',
    local_filename='SMRT_dataset.csv', overwrite=False
):
    """The METLIN small-molecule retention time (SMRT) dataset: ~80k
    molecules with experimental HPLC retention times.

    Returns
    -------
    pandas.DataFrame with at least 'pubchem', 'inchi' (or 'smiles'), and
    'rt' columns as distributed.
    """
    f = get(download_url, local_filename, overwrite=overwrite)
    try:
        df = pd.read_csv(f, sep=';')
        if df.shape[1] == 1:
            df = pd.read_csv(f)
    except Exception as e:
        raise RuntimeError(
            f'Loading {local_filename} failed due to error: {e}.'
        )
    return df
