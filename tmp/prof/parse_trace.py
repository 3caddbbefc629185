import gzip, json, sys, collections
path = sys.argv[1]
with gzip.open(path, 'rt') as f:
    data = json.load(f)
events = data.get('traceEvents', [])
# find device-side complete events with hlo_category
by_cat = collections.Counter()
by_op = collections.Counter()
total = 0.0
for e in events:
    if e.get('ph') != 'X':
        continue
    args = e.get('args') or {}
    cat = args.get('hlo_category')
    if cat is None:
        continue
    dur = e.get('dur', 0) / 1e3  # ms
    by_cat[cat] += dur
    name = e.get('name', '?')
    by_op[(name[:80], cat)] += dur
    total += dur
print(f"total device ms: {total:.1f}")
for cat, ms in by_cat.most_common(15):
    print(f"{ms:9.2f} ms  {100*ms/total:5.1f}%  {cat}")
print("\ntop ops:")
for (name, cat), ms in by_op.most_common(30):
    print(f"{ms:9.2f} ms  {100*ms/total:5.1f}%  [{cat}] {name}")
