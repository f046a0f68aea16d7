// Headless execution harness for the built-in web UI's script
// (xspect2_tpu/webui.py INDEX_HTML <script> body).
//
// Provides a minimal DOM/fetch stub, executes the UI script inside it,
// and drives the full user scenario: model list load, hash-router deep
// links, model detail + metadata editing, classify submit -> poll ->
// chart render, filter submit -> download link.  Used two ways:
//   node tests/webui_js_driver.js <extracted-script.js>   (CI / pytest)
//   browser: load this file, then __runWebuiScenario(scriptSource)
'use strict';

function makeEnv() {
  const els = new Map();

  class ClassList {
    constructor() { this._s = new Set(); }
    add(c) { this._s.add(c); }
    remove(c) { this._s.delete(c); }
    contains(c) { return this._s.has(c); }
    toggle(c, force) {
      const on = force === undefined ? !this._s.has(c) : !!force;
      if (on) this._s.add(c); else this._s.delete(c);
      return on;
    }
  }

  function makeEl(id) {
    return {
      id,
      dataset: {},
      classList: new ClassList(),
      innerHTML: '',
      textContent: '',
      value: '',
      files: [],
      onclick: null,
      onchange: null,
      scrollIntoView() {},
      closest() { return null; },
      querySelector() { return makeEl(''); },
    };
  }

  function el(id) {
    if (!els.has(id)) els.set(id, makeEl(id));
    return els.get(id);
  }

  const navButtons = ['classify', 'filter', 'models'].map((v) => {
    const b = makeEl('nav-' + v);
    b.dataset.v = v;
    return b;
  });
  const views = ['classify', 'filter', 'models'].map(el);

  const docListeners = {};
  const winListeners = {};

  const documentStub = {
    getElementById: el,
    querySelectorAll(sel) {
      if (sel === 'nav button') return navButtons;
      if (sel === '.view') return views;
      return [];
    },
    addEventListener(type, fn) {
      (docListeners[type] = docListeners[type] || []).push(fn);
    },
  };
  const windowStub = {
    addEventListener(type, fn) {
      (winListeners[type] = winListeners[type] || []).push(fn);
    },
  };

  const locationStub = {
    _hash: '',
    get hash() { return this._hash; },
    set hash(v) {
      this._hash = v;
      (winListeners.hashchange || []).forEach((fn) => {
        Promise.resolve().then(fn);
      });
    },
  };

  const routes = {}; // path -> (url, opts) => {status, body}
  const fetchLog = [];
  function fetchStub(url, opts) {
    fetchLog.push(url);
    const path = url.split('?')[0];
    const handler = routes[path];
    const r = handler ? handler(url, opts || {}) : { status: 404, body: {} };
    return Promise.resolve({
      status: r.status,
      ok: r.status >= 200 && r.status < 300,
      json: () => Promise.resolve(r.body),
    });
  }

  class FormDataStub { append() {} }

  return {
    el, els, routes, fetchLog, docListeners,
    document: documentStub, window: windowStub, location: locationStub,
    fetch: fetchStub, FormData: FormDataStub,
  };
}

const __tick = () => new Promise((r) => setTimeout(r, 0));
async function __settle(n) {
  for (let i = 0; i < (n || 20); i++) await __tick();
}

async function __runWebuiScenario(scriptSource) {
  const env = makeEnv();
  const checks = [];
  const check = (name, cond) => checks.push({ name, ok: !!cond });

  // a real DOM pre-selects each <select>'s first <option>; the stub
  // must match because loadModels reads cType.value at load time
  env.el('cType').value = 'Species';
  env.el('fType').value = 'Genus';
  env.el('cStep').value = '1';
  env.el('fThr').value = '0.7';

  env.routes['/api/list-models'] = () => (
    { status: 200, body: { Species: ['Demo'], Genus: ['DemoG'] } });
  env.routes['/api/model-metadata'] = (url, opts) => (
    opts.method === 'POST'
      ? { status: 200, body: {} }
      : { status: 200,
          body: {
            model_slug: 'demo-species',
            model_class: 'ProbabilisticFilterSVMModel',
            model_type: 'Species', k: 21, fpr: 0.01,
            display_names: { 470: 'A. baumannii' },
            author: 'a', author_email: 'e',
          } });
  env.routes['/api/classification-result'] = () => (
    { status: 200,
      body: {
        input_source: 'x.fasta', model_slug: 'demo-species',
        prediction: '470',
        scores: { total: { 470: 0.9, 28901: 0.1 }, rec1: { 470: 1.0 } },
        hits: {}, num_kmers: {},
      } });
  env.routes['/api/filtering-result'] = () => (
    { status: 200, body: { message: 'Sequences filtered successfully' } });
  env.routes['/api/upload-file'] = () => (
    { status: 200, body: { filename: 'f.fasta' } });
  env.routes['/api/classify'] = () => ({ status: 200, body: { uuid: 'u42' } });
  env.routes['/api/filter'] = () => ({ status: 200, body: { uuid: 'u77' } });
  env.routes['/api/model-display-name'] = () => ({ status: 200, body: {} });

  // a syntax error in the UI script throws right here
  let exposed = {};
  const run = new Function(
    'document', 'window', 'location', 'fetch', 'FormData', '__expose',
    scriptSource + '\n;__expose({ runClassify, runFilter });'
  );
  run(env.document, env.window, env.location, env.fetch, env.FormData,
      (x) => { exposed = x; });

  await __settle();
  check('model list rendered',
        env.el('mList').innerHTML.includes('card-demo-species'));
  check('classify model options populated',
        env.el('cModel').innerHTML.includes('Demo'));

  // deep link into the model detail page
  env.location.hash = '#/models/demo-species';
  await __settle();
  check('models deep link opens card',
        env.el('card-demo-species').classList.contains('open'));
  check('detail metadata rendered',
        env.el('detail-demo-species').innerHTML.includes('model_slug'));
  check('display names rendered',
        env.el('detail-demo-species').innerHTML.includes('A. baumannii'));

  // author save through the delegated [data-act] click handler
  const td = {
    querySelector: (sel) => (
      { value: sel === '.auth-name' ? 'new author' : 'new@mail' }),
  };
  const btn = {
    dataset: { act: 'save-author', slug: 'demo-species' },
    closest: (sel) => (sel === '[data-act]' ? btn : td),
  };
  (env.docListeners.click || []).forEach((fn) => fn({ target: btn }));
  await __settle();
  check('author save posts and confirms',
        env.el('dstat-demo-species').textContent === 'Saved.');

  // classify: upload -> submit -> deep link -> poll -> chart render
  env.el('cFile').files = [{}];
  env.el('cType').value = 'Species';
  env.el('cModel').value = 'Demo';
  env.el('cStep').value = '1';
  await exposed.runClassify();
  await __settle();
  check('classify deep link set', env.location.hash === '#/result/u42');
  check('classify status done', env.el('cStatus').textContent === 'Done.');
  check('classify result rendered',
        env.el('cResult').innerHTML.includes('Prediction'));
  check('score bars rendered',
        env.el('cResult').innerHTML.includes('class="bar"'));
  check('per-record chart present',
        env.el('cResult').innerHTML.includes('Per-record scores'));

  // filter: upload -> submit -> deep link -> poll -> download link
  env.el('fFile').files = [{}];
  env.el('fType').value = 'Genus';
  env.el('fModel').value = 'DemoG';
  env.el('fThr').value = '0.7';
  await exposed.runFilter();
  await __settle();
  check('filter deep link set', env.location.hash === '#/filter-result/u77');
  check('filter download link rendered',
        env.el('fResult').innerHTML.includes('download-filtered'));
  check('filter score chart rendered',
        env.el('fResult').innerHTML.includes('class="bar"'));

  return { ok: checks.every((c) => c.ok), checks };
}

/* eslint-disable no-undef */
if (typeof process !== 'undefined' && process.argv && process.argv[2]) {
  const fs = require('fs');
  const src = fs.readFileSync(process.argv[2], 'utf8');
  __runWebuiScenario(src).then(
    (r) => { console.log(JSON.stringify(r)); process.exit(r.ok ? 0 : 1); },
    (e) => {
      console.log(JSON.stringify(
        { ok: false, error: String((e && e.stack) || e) }));
      process.exit(1);
    }
  );
}
