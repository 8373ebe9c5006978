"""tqdm shim: identity iterator (reference uses it for progress bars only)."""
def tqdm(iterable=None, *a, **k):
    return iterable
