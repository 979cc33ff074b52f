"""HTTP download with progress and byte-range resume.

Mirrors /root/reference/datasets/utils.py:10-27. NOTE: this build
environment has zero network egress — dataset downloads are only usable
in deployments with connectivity; tests use synthetic fixtures.
"""

import os


def download(filename, source, dest):
    import requests
    from tqdm import tqdm
    print("Downloading '{}'...".format(filename))
    url = source + filename
    path = os.path.join(dest, filename)
    try:
        with open(path, 'ab') as f:
            headers = {}
            pos = f.tell()
            if pos:
                headers['Range'] = 'bytes={}-'.format(pos)
            resp = requests.get(url, headers=headers, stream=True)
            total_size = resp.headers.get('content-length', None)
            total = int(total_size) // 1024 if total_size else None
            for data in tqdm(iterable=resp.iter_content(chunk_size=512),
                             total=total, unit='KB'):
                f.write(data)
    except requests.exceptions.RequestException:
        print("\nError downloading, attempting to resume...")
        download(filename, source, dest)
