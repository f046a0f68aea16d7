"""Built-in single-page web UI.

The reference ships a pre-built React/Vite SPA as package data
(reference: src/xspect/xspect-web/, routes /classify /filter /models
/result).  This framework serves an equivalent dependency-free
single-file application against the same REST API: classify and filter
forms with upload + polling, model listing/metadata, and a result view
with score bars.
"""

INDEX_HTML = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<title>XspecT2-TPU</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
:root { --fg:#1a1a1a; --mut:#667; --line:#dde; --acc:#2458e6; --bg:#fff; }
*{box-sizing:border-box} body{font-family:system-ui,sans-serif;color:var(--fg);
 background:var(--bg);max-width:860px;margin:0 auto;padding:1em}
nav{display:flex;gap:.4em;border-bottom:2px solid var(--line);margin-bottom:1.2em}
nav button{border:none;background:none;padding:.7em 1em;font-size:1em;cursor:pointer;
 color:var(--mut);border-bottom:2px solid transparent;margin-bottom:-2px}
nav button.active{color:var(--acc);border-bottom-color:var(--acc);font-weight:600}
h1{font-size:1.3em} .view{display:none}.view.active{display:block}
label{display:block;margin:.8em 0 .2em;font-weight:600;font-size:.9em}
input,select{padding:.45em;border:1px solid var(--line);border-radius:6px;width:100%;max-width:22em}
button.go{margin-top:1em;background:var(--acc);color:#fff;border:none;border-radius:6px;
 padding:.6em 1.4em;font-size:1em;cursor:pointer}
.card{border:1px solid var(--line);border-radius:8px;padding:1em;margin:.8em 0}
.bar{height:14px;background:var(--acc);border-radius:3px;min-width:2px}
.row{display:flex;align-items:center;gap:.6em;margin:.25em 0;font-size:.85em}
.row .lbl{width:11em;text-align:right;color:var(--mut);overflow:hidden;text-overflow:ellipsis}
.row .val{width:3.5em}.muted{color:var(--mut);font-size:.85em}
pre{background:#f6f7fa;padding:.8em;border-radius:6px;overflow:auto;font-size:.8em}
.status{margin-top:.8em;font-size:.9em;color:var(--mut)}
</style></head><body>
<h1>XspecT2-TPU <span class="muted">taxonomic classification</span></h1>
<nav>
 <button data-v="classify" class="active">Classify</button>
 <button data-v="filter">Filter</button>
 <button data-v="models">Models</button>
</nav>

<div id="classify" class="view active">
 <label>Sample file (FASTA/FASTQ)</label><input type="file" id="cFile">
 <label>Type</label><select id="cType"><option>Species</option><option>Genus</option></select>
 <label>Model</label><select id="cModel"></select>
 <label>Sparse sampling step</label><input type="number" id="cStep" value="1" min="1">
 <button class="go" onclick="runClassify()">Classify</button>
 <div class="status" id="cStatus"></div>
 <div id="cResult"></div>
</div>

<div id="filter" class="view">
 <label>Sample file (FASTA/FASTQ)</label><input type="file" id="fFile">
 <label>Type</label><select id="fType"><option>Genus</option><option>Species</option></select>
 <label>Genus model</label><select id="fModel"></select>
 <label>Species id (species filtering only)</label><input id="fSpecies" placeholder="e.g. 470">
 <label>Threshold (-1 = argmax)</label><input type="number" id="fThr" value="0.7" step="0.1">
 <button class="go" onclick="runFilter()">Filter</button>
 <div class="status" id="fStatus"></div>
 <div id="fResult"></div>
</div>

<div id="models" class="view">
 <div id="mList" class="muted">loading…</div>
</div>

<script>
const $ = (id) => document.getElementById(id);
const api = (p) => fetch(p).then(r => r.json());

document.querySelectorAll('nav button').forEach(b => b.onclick = () => {
  document.querySelectorAll('nav button').forEach(x => x.classList.remove('active'));
  document.querySelectorAll('.view').forEach(x => x.classList.remove('active'));
  b.classList.add('active'); $(b.dataset.v).classList.add('active');
});

let MODELS = {};
async function loadModels() {
  MODELS = await api('/api/list-models');
  const opts = (t) => (MODELS[t] || []).map(m => `<option>${m}</option>`).join('');
  $('cModel').innerHTML = opts($('cType').value);
  $('fModel').innerHTML = opts('Species');
  let html = '';
  for (const [type, names] of Object.entries(MODELS)) {
    for (const n of names) {
      const slug = n.toLowerCase().replace(/[^a-z0-9]+/g, '-') + '-' + type.toLowerCase();
      html += `<div class="card"><b>${n}</b> <span class="muted">(${type})</span>
        <pre id="meta-${slug}">…</pre></div>`;
    }
  }
  $('mList').innerHTML = html || 'No models found — train one with the CLI.';
  for (const [type, names] of Object.entries(MODELS)) {
    for (const n of names) {
      const slug = n.toLowerCase().replace(/[^a-z0-9]+/g, '-') + '-' + type.toLowerCase();
      api('/api/model-metadata?model_slug=' + slug)
        .then(d => { const el = $('meta-' + slug); if (el) el.textContent = JSON.stringify(d, null, 1); });
    }
  }
}
$('cType').onchange = () => {
  $('cModel').innerHTML = (MODELS[$('cType').value] || []).map(m => `<option>${m}</option>`).join('');
};
loadModels();

async function upload(fileInput, statusEl) {
  const f = fileInput.files[0];
  if (!f) { statusEl.textContent = 'Choose a file first.'; return null; }
  statusEl.textContent = 'Uploading…';
  const fd = new FormData(); fd.append('file', f);
  const r = await fetch('/api/upload-file', { method: 'POST', body: fd }).then(r => r.json());
  return r.filename;
}

function scoreBars(scores) {
  const entries = Object.entries(scores).sort((a, b) => b[1] - a[1]).slice(0, 15);
  return entries.map(([k, v]) =>
    `<div class="row"><div class="lbl">${k}</div>
     <div class="bar" style="width:${Math.max(2, v * 300)}px"></div>
     <div class="val">${v.toFixed(2)}</div></div>`).join('');
}

async function runClassify() {
  const fname = await upload($('cFile'), $('cStatus')); if (!fname) return;
  $('cStatus').textContent = 'Classifying…';
  const q = `classification_type=${$('cType').value}&model=${encodeURIComponent($('cModel').value)}` +
            `&file=${encodeURIComponent(fname)}&step=${$('cStep').value}`;
  const { uuid } = await fetch('/api/classify?' + q, { method: 'POST' }).then(r => r.json());
  for (let i = 0; i < 120; i++) {
    await new Promise(res => setTimeout(res, 1000));
    const r = await fetch('/api/classification-result?uuid=' + uuid);
    if (r.status === 200) {
      const d = await r.json();
      $('cStatus').textContent = 'Done.';
      $('cResult').innerHTML = `<div class="card">
        ${d.prediction !== undefined ? `<b>Prediction: ${d.prediction}</b>` : ''}
        <div class="muted">${d.input_source || ''} · model ${d.model_slug}</div>
        <h3 style="font-size:.9em">Total scores</h3>${scoreBars(d.scores.total)}
        <details><summary class="muted">raw result</summary><pre>${JSON.stringify(d, null, 1)}</pre></details>
      </div>`;
      return;
    }
  }
  $('cStatus').textContent = 'Timed out waiting for result.';
}

async function runFilter() {
  const fname = await upload($('fFile'), $('fStatus')); if (!fname) return;
  $('fStatus').textContent = 'Filtering…';
  let q = `filter_type=${$('fType').value}&genus=${encodeURIComponent($('fModel').value)}` +
          `&input_file=${encodeURIComponent(fname)}&threshold=${$('fThr').value}`;
  if ($('fType').value === 'Species') q += `&filter_species=${encodeURIComponent($('fSpecies').value)}`;
  const { uuid } = await fetch('/api/filter?' + q, { method: 'POST' }).then(r => r.json());
  for (let i = 0; i < 120; i++) {
    await new Promise(res => setTimeout(res, 1000));
    const r = await fetch('/api/filtering-result?uuid=' + uuid);
    if (r.status === 200) {
      const d = await r.json();
      $('fStatus').textContent = d.message;
      if ((d.message || '').includes('successfully')) {
        $('fResult').innerHTML =
          `<div class="card"><a href="/api/download-filtered?uuid=${uuid}">Download filtered FASTA</a></div>`;
      }
      return;
    }
  }
  $('fStatus').textContent = 'Timed out waiting for result.';
}
</script></body></html>
"""
