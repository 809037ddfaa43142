"""Thin browser client for the HTTP API — the visual front end standing
in for the reference's GTK main window (SURVEY.md L5; reference
cremage_main.py MainWindow: prompt panes, generation settings, live
status, result thumbnails, image library with favorite/trash).

One dependency-free HTML page served at GET / by app/server.py; all
behavior goes through the same /v1/* JSON endpoints any other client
uses, so this stays a pure presentation layer.
"""
from __future__ import annotations

INDEX_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>cremage-tpu</title>
<style>
  :root { color-scheme: dark; }
  body { font-family: system-ui, sans-serif; margin: 0; background: #161618;
         color: #e8e8ea; display: flex; height: 100vh; }
  #panel { width: 380px; padding: 16px; overflow-y: auto; background: #1e1e22;
           border-right: 1px solid #333; flex-shrink: 0; }
  #main { flex: 1; padding: 16px; overflow-y: auto; }
  h1 { font-size: 16px; margin: 0 0 12px; letter-spacing: .05em; }
  label { display: block; font-size: 11px; color: #9a9aa2; margin: 10px 0 2px;
          text-transform: uppercase; letter-spacing: .06em; }
  textarea, input, select { width: 100%; box-sizing: border-box;
    background: #26262c; color: #e8e8ea; border: 1px solid #3a3a42;
    border-radius: 6px; padding: 6px 8px; font-size: 13px; }
  textarea { height: 64px; resize: vertical; }
  .row { display: flex; gap: 8px; } .row > div { flex: 1; }
  button { background: #4953e8; color: white; border: 0; border-radius: 6px;
    padding: 10px 14px; font-size: 14px; cursor: pointer; margin-top: 14px;
    width: 100%; }
  button:disabled { background: #333; color: #777; }
  button.small { width: auto; padding: 4px 10px; font-size: 12px;
    margin: 4px 4px 0 0; background: #2e2e36; }
  #status { font-size: 12px; color: #8fd18f; min-height: 18px;
    margin-top: 10px; white-space: pre-wrap; }
  #tokens { font-size: 11px; color: #9a9aa2; margin-top: 4px; }
  #gallery { display: flex; flex-wrap: wrap; gap: 12px; }
  .card { background: #1e1e22; border: 1px solid #333; border-radius: 8px;
    padding: 8px; max-width: 270px; }
  .card img { max-width: 256px; border-radius: 4px; display: block; }
  .card .meta { font-size: 10px; color: #9a9aa2; margin-top: 6px;
    max-height: 48px; overflow: hidden; }
  .tabs { display: flex; gap: 6px; margin-bottom: 12px; }
  .tabs button { width: auto; margin: 0; padding: 6px 14px;
    background: #26262c; }
  .tabs button.active { background: #4953e8; }
  .err { color: #e88; }
</style>
</head>
<body>
<div id="panel">
  <h1>CREMAGE-TPU</h1>
  <label>Prompt</label>
  <textarea id="prompt" oninput="countTokens()">a photograph of an astronaut riding a horse</textarea>
  <div id="tokens"></div>
  <select id="history" onchange="useHistory()">
    <option value="">↩ prompt history…</option>
  </select>
  <label>Negative prompt</label>
  <textarea id="negative"></textarea>
  <label>Model</label>
  <select id="model"></select>
  <div class="row">
    <div><label>Sampler</label><select id="sampler"></select></div>
    <div><label>Steps</label><input id="steps" type="number" value="20"></div>
  </div>
  <div class="row">
    <div><label>Width</label><input id="W" type="number" value="512" step="8"></div>
    <div><label>Height</label><input id="H" type="number" value="512" step="8"></div>
  </div>
  <div class="row">
    <div><label>CFG scale</label><input id="scale" type="number" value="7.5" step="0.5"></div>
    <div><label>Seed (-1 random)</label><input id="seed" type="number" value="-1"></div>
  </div>
  <div class="row">
    <div><label>Batch</label><input id="n_samples" type="number" value="1"></div>
    <div><label>Batches</label><input id="n_iter" type="number" value="1"></div>
  </div>
  <label>Checkpoint path (optional)</label>
  <input id="ckpt" placeholder="uses preferences default">
  <div class="row">
    <div><label>LoRA models (comma-sep paths)</label>
      <input id="lora_models" placeholder="a.safetensors,b.safetensors"></div>
    <div><label>LoRA weights</label>
      <input id="lora_weights" placeholder="0.8,0.5"></div>
  </div>
  <div class="row">
    <div><label>Mode</label>
      <select id="mode">
        <option value="text_to_image">txt2img</option>
        <option value="image_to_image">img2img</option>
        <option value="inpainting">inpaint</option>
        <option value="spot_inpainting">spot inpaint</option>
        <option value="face_fix">face fix (SD 1.5; init image)</option>
        <option value="image_to_video">img2vid (pick the SVD model type; init image)</option>
      </select></div>
    <div><label>Strength (img2img / face-fix repair)</label>
      <input id="strength" type="number" value="0.75" step="0.05"></div>
  </div>
  <div id="videobox" class="row" style="display:none">
    <div><label>Video frames (SVD)</label>
      <input id="video_frames" type="number" value="14" min="2"></div>
    <div><label>FILM interpolation passes (0 = off; each pass doubles
      the in-between density)</label>
      <input id="video_interp" type="number" value="3" min="0" max="5"></div>
    <div><label><input id="video_mp4" type="checkbox" checked>
      write mp4 (one-click chain: generate &rarr; interpolate &rarr;
      mp4)</label></div>
  </div>
  <label>Init image (img2img / inpaint) — or drag &amp; drop a file or a
    gallery/library image anywhere on the page</label>
  <input id="init_file" type="file" accept="image/*">
  <label>Mask image (inpaint; white = repaint)</label>
  <input id="mask_file" type="file" accept="image/*">
  <label>Advanced parameters (JSON, merged into the job — e.g.
    Kandinsky/Cascade/Hunyuan component checkpoint paths,
    flux_quantize, unet_quantize, dit_quantize, control_net,
    deep_cache — e.g. {"deep_cache": 2} for ~1.5-2x faster
    sampling, any family; tome_ratio — e.g. {"tome_ratio": 0.5}
    token merging for SD1.5/SDXL, composes with deep_cache;
    cfg_interval_low/high — e.g. {"cfg_interval_low": 0.3,
    "cfg_interval_high": 6.0} skips the uncond pass outside that
    sigma window, k-diffusion/EDM/flow samplers; ada_cache — e.g.
    {"ada_cache": 0.2} adaptive step caching: skip whole denoiser
    steps while the accumulated input change stays below the
    threshold, any image family, excludes deep_cache)</label>
  <textarea id="advanced" rows="2" placeholder='{"prior_ckpt": "..."}'></textarea>
  <button class="small" id="paint_btn" onclick="paintOpen()">Paint mask on init image</button>
  <div id="paintbox" style="display:none">
    <canvas id="paint_canvas" style="max-width:100%; cursor:crosshair; touch-action:none"></canvas>
    <div>
      <label>Brush <input id="brush" type="range" min="4" max="96" value="32" style="width:120px"></label>
      <button class="small" onclick="paintClear()">Clear</button>
      <button class="small" onclick="paintUse()">Use as mask</button>
      <span id="paint_state" style="font-size:12px"></span>
    </div>
  </div>
  <button id="go" onclick="generate()">Generate</button>
  <div id="status"></div>
</div>
<div id="main">
  <div class="tabs">
    <button id="tab-results" class="active" onclick="showTab('results')">Results</button>
    <button id="tab-library" onclick="showTab('library')">Library</button>
    <button id="tab-tools" onclick="showTab('tools')">Tools</button>
    <button id="tab-prefs" onclick="showTab('prefs')">Preferences</button>
  </div>
  <div id="libhelp" style="display:none; font-size:11px; color:#9a9aa2;
       margin-bottom:8px">keyboard: ↑/↓/←/→ or j/k select · Home/End jump
    · f favorite · m mark · g go to mark · Delete/Backspace trash ·
    Enter use settings (reference image_listbox_handlers flows)</div>
  <div id="gallery" tabindex="0" style="outline:none"></div>
  <div id="toolsec" style="display:none; max-width: 640px">
    <h1>LLM chat</h1>
    <div id="chatlog" style="font-size:13px; white-space:pre-wrap"></div>
    <input id="chat_msg" placeholder="ask about an image or a prompt…">
    <button class="small" onclick="chatSend()">Send</button>
    <button class="small" onclick="chatReset()">Reset</button>

    <h1 style="margin-top:24px">Prompt builder</h1>
    <input id="pb_dir" placeholder="prompt builder dir (blank = default)">
    <button class="small" onclick="pbLoad()">Load categories</button>
    <div id="pb_cats" style="font-size:12px"></div>

    <h1 style="margin-top:24px">Mask tools</h1>
    <input id="mask_tool_file" type="file" accept="image/*">
    <button class="small" onclick="maskOp('dilate')">Dilate</button>
    <button class="small" onclick="maskOp('erode')">Erode</button>
    <button class="small" onclick="maskOp('invert')">Invert</button>
    <img id="mask_preview" style="max-width:256px; display:block; margin-top:8px">

    <h1 style="margin-top:24px">Segment → inpaint mask</h1>
    <input id="seg_file" type="file" accept="image/*">
    <input id="seg_labels" placeholder="labels, e.g. Hair, Face">
    <button class="small" onclick="segRun()">Segment</button>
    <img id="seg_preview" style="max-width:256px; display:block; margin-top:8px">

    <h1 style="margin-top:24px">Face tools</h1>
    <input id="face_file" type="file" accept="image/*">
    <button class="small" onclick="faceOp('face_detect')">Detect</button>
    <button class="small" onclick="faceOp('unblur')">Unblur</button>
    <button class="small" onclick="faceOp('colorize')">Colorize</button>
    <button class="small" onclick="faceOp('gfpgan')">GFPGAN</button>
    <div id="face_boxes" style="font-size:12px"></div>
    <img id="face_preview" style="max-width:256px; display:block; margin-top:8px">

    <h1 style="margin-top:24px">Model mixer</h1>
    <label>Checkpoint paths (comma-sep, server-side)</label>
    <input id="mix_paths" placeholder="a.safetensors,b.safetensors">
    <label>Weights (comma-sep, same count)</label>
    <input id="mix_weights" placeholder="0.7,0.3">
    <label>Output path</label>
    <input id="mix_output" placeholder="mixed.safetensors">
    <button class="small" onclick="mixRun()">Mix</button>
    <div id="mix_state" style="font-size:12px"></div>
  </div>
  <div id="prefsec" style="display:none; max-width: 640px">
    <h1>Preferences</h1>
    <div style="font-size:11px; color:#9a9aa2">the server's shared
      Preferences instance (reference preferences dialog); saving
      persists to the server's config file when one is loaded</div>
    <div id="pref_rows"></div>
    <button class="small" onclick="prefsSave()">Save changes</button>
    <button class="small" onclick="prefsLoad()">Reload</button>
    <div id="pref_state" style="font-size:12px"></div>
  </div>
</div>
<script>
const $ = id => document.getElementById(id);
let tab = 'results';

async function api(path, body) {
  const opts = body ? {method: 'POST', body: JSON.stringify(body),
                       headers: {'Content-Type': 'application/json'}} : {};
  const r = await fetch(path, opts);
  const j = await r.json();
  if (!r.ok) throw new Error(j.error || r.status);
  return j;
}

let samplersByType = {};

function fillSamplers() {
  const menu = samplersByType[$('model').value] || [];
  const prev = $('sampler').value;
  $('sampler').innerHTML = '';
  for (const s of menu) {
    const o = document.createElement('option'); o.textContent = s;
    $('sampler').appendChild(o);
  }
  const def = menu.includes(prev) ? prev
    : (menu.includes('Euler A') ? 'Euler A'
       : (menu.includes('EulerEDMSampler') ? 'EulerEDMSampler' : menu[0]));
  if (def) $('sampler').value = def;
}

async function boot() {
  try {
    const m = await api('/v1/meta');
    samplersByType = m.samplers_by_type || {};
    for (const t of m.model_types) {
      const o = document.createElement('option'); o.textContent = t;
      $('model').appendChild(o);
    }
    $('model').onchange = fillSamplers;
    fillSamplers();
  } catch (e) { $('status').textContent = 'meta failed: ' + e; }
  loadHistory();
  countTokens();
  poll();
}

async function loadHistory() {
  try {
    const h = await api('/v1/history');
    $('history').innerHTML = '<option value="">↩ prompt history…</option>';
    for (const p of h.prompts.slice().reverse()) {
      const o = document.createElement('option');
      o.value = p; o.textContent = p.slice(0, 60);
      $('history').appendChild(o);
    }
  } catch (e) { /* non-fatal */ }
}

function useHistory() {
  const v = $('history').value;
  if (v) { $('prompt').value = v; countTokens(); }
}

let tokTimer;
function countTokens() {
  clearTimeout(tokTimer);
  tokTimer = setTimeout(async () => {
    try {
      const t = await api('/v1/tools/tokenize', {prompt: $('prompt').value});
      $('tokens').textContent = t.total_tokens + ' tokens / ' +
        t.chunks + ' chunk(s)';
    } catch (e) { /* non-fatal */ }
  }, 250);
}

async function uploadFile(inputId) {
  const f = $(inputId).files[0];
  if (!f) return undefined;
  const b64 = await new Promise((res, rej) => {
    const r = new FileReader();
    r.onload = () => res(r.result.split(',')[1]);
    r.onerror = rej; r.readAsDataURL(f);
  });
  const out = await api('/v1/upload', {image: b64});
  return out.path;
}

async function generate() {
  $('go').disabled = true;
  $('status').textContent = 'submitting…';
  $('status').className = '';
  try {
    const init_img = droppedInit
      ? (await api('/v1/upload', {image: droppedInit})).path
      : await uploadFile('init_file');
    const mask_img = paintedMask
      ? (await api('/v1/upload', {image: paintedMask})).path
      : await uploadFile('mask_file');
    const num = (id, d, f) => {
      const v = (f || parseInt)($(id).value);
      return Number.isFinite(v) ? v : d;
    };
    let advanced = {};
    if ($('advanced').value.trim()) {
      try { advanced = JSON.parse($('advanced').value); }
      catch (e) { throw new Error('advanced parameters are not valid JSON'); }
    }
    const mode = $('mode').value;
    // dispatch is by model type: img2vid needs the SVD backend
    if (mode === 'image_to_video' && !/SVD|video/i.test($('model').value))
      throw new Error('img2vid needs the SVD model type selected');
    if (mode === 'image_to_video' && !init_img)
      throw new Error('img2vid needs an init image');
    // the face-fix job reads auto_face_fix_strength (the reference
    // face fixer's denoising strength), not img2img strength
    const modeExtra = mode === 'face_fix'
      ? {auto_face_fix_strength: num('strength', 0.3, parseFloat)} : {};
    // one-click video chain (reference video_generator.py:427-478):
    // img2vid -> FILM interpolation -> mp4, all in this single job
    const videoExtra = mode === 'image_to_video' ? {
      num_frames: num('video_frames', 14),
      interpolation_frames: num('video_interp', 3),
      make_mp4: $('video_mp4').checked,
    } : {};
    await api('/v1/generate', {
      ...modeExtra,
      ...videoExtra,
      ...advanced,
      mode,
      // results as file references into the outputs library — the
      // browser pulls binary PNGs over GET instead of b64-in-JSON
      result_delivery: 'path',
      init_img, mask_img,
      strength: num('strength', 0.75, parseFloat),
      generator_model_type: $('model').value,
      prompt: $('prompt').value,
      negative_prompt: $('negative').value,
      sampler: $('sampler').value,
      sampling_steps: num('steps', 20),
      W: num('W', 512), H: num('H', 512),
      scale: num('scale', 7.5, parseFloat),
      seed: num('seed', -1),
      n_samples: num('n_samples', 1),
      n_iter: num('n_iter', 1),
      ckpt: $('ckpt').value || undefined,
      lora_models: $('lora_models').value || undefined,
      lora_weights: $('lora_weights').value || undefined,
    });
    $('status').textContent = 'queued';
    loadHistory();
  } catch (e) {
    $('status').textContent = String(e);
    $('status').className = 'err';
    $('go').disabled = false;
  }
}

function addCard(src, meta, extra) {
  const card = document.createElement('div'); card.className = 'card';
  const img = document.createElement('img'); img.src = src;
  card.appendChild(img);
  if (meta) {
    const d = document.createElement('div'); d.className = 'meta';
    d.textContent = meta; card.appendChild(d);
  }
  if (extra) card.appendChild(extra);
  $('gallery').prepend(card);
}

async function poll() {
  try {
    const s = await api('/v1/status');
    for (const m of s.messages) {
      if (typeof m === 'string') { $('status').textContent = m; continue; }
      if (m.image_b64 && tab === 'results')
        addCard('data:image/png;base64,' + m.image_b64,
                m.generation_parameters);
      if (m.image_path && tab === 'results')
        addCard('/v1/images/file?path=' + encodeURIComponent(m.image_path),
                m.generation_parameters);
      if (m.video_path && tab === 'results') {
        const src = '/v1/images/file?path='
          + encodeURIComponent(m.video_path);
        const card = document.createElement('div'); card.className = 'card';
        const v = document.createElement('video');
        v.src = src; v.controls = true; v.loop = true;
        v.style.maxWidth = '100%';
        const a = document.createElement('a');
        a.href = src; a.download = 'video.mp4';
        a.textContent = 'download mp4';
        card.appendChild(v); card.appendChild(a);
        $('gallery').prepend(card);
      }
      if (m.job_done !== undefined) {
        const jd = m.job_done || {};
        $('status').textContent = jd.ok ? 'done' : ('failed: ' + jd.error);
        $('status').className = jd.ok ? '' : 'err';
        $('go').disabled = false;
      }
    }
  } catch (e) { /* server restarting */ }
  setTimeout(poll, 800);
}

// Mask painting canvas (reference tools/mask_image_editor.py +
// spot_inpainter.py draw surface): paint over the init image, the
// hidden companion canvas accumulates a white-on-black mask that
// generate() uploads in place of a mask file.
let maskCanvas = null, paintCtx = null, maskCtx = null;
let painting = false, paintedMask = null;

async function paintOpen() {
  const f = $('init_file').files[0];
  if (!f && !droppedInit) {
    $('status').textContent = 'choose an init image first'; return;
  }
  const img = new Image();
  const url = droppedInit ? 'data:image/png;base64,' + droppedInit
                          : URL.createObjectURL(f);
  await new Promise(res => { img.onload = res; img.src = url; });
  const c = $('paint_canvas');
  c.width = img.naturalWidth; c.height = img.naturalHeight;
  paintCtx = c.getContext('2d');
  paintCtx.drawImage(img, 0, 0);
  maskCanvas = document.createElement('canvas');
  maskCanvas.width = c.width; maskCanvas.height = c.height;
  maskCtx = maskCanvas.getContext('2d');
  maskCtx.fillStyle = '#000'; maskCtx.fillRect(0, 0, c.width, c.height);
  $('paintbox').style.display = 'block';
  paintedMask = null; $('paint_state').textContent = '';
  c.onpointerdown = e => { painting = true; paintDot(e); };
  c.onpointermove = e => { if (painting) paintDot(e); };
  c.onpointerup = () => { painting = false; };
  c.onpointerleave = () => { painting = false; };
}

function paintDot(e) {
  const c = $('paint_canvas');
  const r = c.getBoundingClientRect();
  const x = (e.clientX - r.left) * c.width / r.width;
  const y = (e.clientY - r.top) * c.height / r.height;
  const w = parseInt($('brush').value);
  const layers = [[maskCtx, '#fff'], [paintCtx, 'rgba(255,60,60,0.55)']];
  for (const [ctx, style] of layers) {
    ctx.fillStyle = style;
    ctx.beginPath(); ctx.arc(x, y, w / 2, 0, 2 * Math.PI); ctx.fill();
  }
}

function paintClear() { paintOpen(); }

function paintUse() {
  if (!maskCanvas) return;
  paintedMask = maskCanvas.toDataURL('image/png').split(',')[1];
  $('paint_state').textContent = 'painted mask will be used';
}

async function fileToB64(inputId) {
  const f = $(inputId).files[0];
  if (!f) return undefined;
  return await new Promise((res, rej) => {
    const r = new FileReader();
    r.onload = () => res(r.result.split(',')[1]);
    r.onerror = rej; r.readAsDataURL(f);
  });
}

async function chatSend() {
  const msg = $('chat_msg').value;
  if (!msg) return;
  $('chat_msg').value = '';
  try {
    const out = await api('/v1/llm/chat', {message: msg});
    $('chatlog').textContent = out.content.map(
      c => (c.speaker === 'user' ? '> ' : '') + c.text).join('\\n');
  } catch (e) { $('chatlog').textContent = String(e); }
}

async function chatReset() {
  await api('/v1/llm/chat', {reset: true});
  $('chatlog').textContent = '';
}

async function pbLoad() {
  try {
    const out = await api('/v1/tools/prompt_builder',
                          {dir: $('pb_dir').value || undefined});
    $('pb_cats').innerHTML = '';
    for (const [cat, items] of Object.entries(out.categories)) {
      const h = document.createElement('div'); h.textContent = cat;
      $('pb_cats').appendChild(h);
      for (const it of items) {
        const b = document.createElement('button');
        b.className = 'small'; b.textContent = it.replace(/\\.[^.]+$/, '');
        b.onclick = async () => {
          const p = await api('/v1/tools/prompt_builder',
            {dir: $('pb_dir').value || undefined,
             selections: [cat + '/' + it]});
          $('prompt').value = ($('prompt').value ? $('prompt').value + ', '
                               : '') + p.prompt;
          countTokens();
        };
        $('pb_cats').appendChild(b);
      }
    }
  } catch (e) { $('pb_cats').textContent = String(e); }
}

async function maskOp(op) {
  const b64 = await fileToB64('mask_tool_file');
  if (!b64) return;
  try {
    const out = await api('/v1/tools/mask', {op, mask: b64, pixels: 8});
    $('mask_preview').src = 'data:image/png;base64,' + out.mask;
  } catch (e) { $('status').textContent = String(e); }
}

async function segRun() {
  const b64 = await fileToB64('seg_file');
  if (!b64) return;
  const labels = $('seg_labels').value.split(',').map(s => s.trim())
    .filter(Boolean);
  try {
    const out = await api('/v1/tools/segment', {image: b64, labels});
    $('seg_preview').src = 'data:image/png;base64,' + out.mask;
  } catch (e) { $('status').textContent = String(e); }
}

async function faceOp(op) {
  const b64 = await fileToB64('face_file');
  if (!b64) return;
  try {
    const out = await api('/v1/tools/' + op, {image: b64});
    if (op === 'face_detect') {
      $('face_boxes').textContent = JSON.stringify(out.boxes);
    } else {
      $('face_preview').src = 'data:image/png;base64,' + out.image;
    }
  } catch (e) { $('status').textContent = String(e); }
}

async function useSettingsFrom(p) {
  const m = await api('/v1/images/meta?path=' + encodeURIComponent(p));
  const g = m.generation_data;
  if (!g) { $('status').textContent = 'no metadata'; return; }
  const map = {prompt: 'prompt', negative_prompt: 'negative',
               sampler: 'sampler', sampling_steps: 'steps',
               W: 'W', H: 'H', scale: 'scale', seed: 'seed',
               n_samples: 'n_samples', n_iter: 'n_iter',
               generator_model_type: 'model'};
  for (const [k, id] of Object.entries(map))
    if (g[k] !== undefined && $(id)) $(id).value = g[k];
  $('status').textContent = 'settings loaded from ' + p;
  countTokens();
}

// Keyboard-driven image browser (reference
// image_listbox_handlers.py:58-190: up/down navigate, Home/End jump,
// f favorite, m mark, g go-to-marked, Delete/BackSpace trash,
// activate = load image settings).
let libItems = [];   // [{path, card}]
let libSel = -1, libMark = -1;

function libSelect(i) {
  if (!libItems.length) return;
  i = Math.max(0, Math.min(libItems.length - 1, i));
  if (libSel >= 0 && libItems[libSel])
    libItems[libSel].card.style.borderColor = '#333';
  libSel = i;
  const it = libItems[i];
  it.card.style.borderColor = '#4953e8';
  it.card.scrollIntoView({block: 'nearest'});
}

function libTrash(i) {
  const it = libItems[i];
  if (!it) return;
  api('/v1/images/trash', {path: it.path});
  it.card.remove();
  libItems.splice(i, 1);
  if (libMark === i) libMark = -1; else if (libMark > i) libMark--;
  libSel = -1;
  libSelect(Math.min(i, libItems.length - 1));
}

function libKeydown(e) {
  if (tab !== 'library' || !libItems.length) return;
  if (/^(INPUT|TEXTAREA|SELECT)$/.test(document.activeElement.tagName))
    return;   // typing in a form field must not drive the browser
  const k = e.key;
  const nav = {ArrowUp: -1, ArrowLeft: -1, k: -1,
               ArrowDown: 1, ArrowRight: 1, j: 1};
  if (k in nav) { libSelect(libSel + nav[k]); e.preventDefault(); }
  else if (k === 'Home') { libSelect(0); e.preventDefault(); }
  else if (k === 'End') { libSelect(libItems.length - 1); e.preventDefault(); }
  else if (k === 'f' || k === 'F') {
    const it = libItems[libSel];
    if (it) { api('/v1/images/favorite', {path: it.path});
              $('status').textContent = 'favorited ' + it.path; }
  } else if (k === 'm' || k === 'M') {
    libMark = libSel;
    $('status').textContent = 'marked image ' + (libSel + 1);
  } else if (k === 'g' || k === 'G') {
    if (libMark >= 0) libSelect(libMark);
  } else if (k === 'Delete' || k === 'Backspace') {
    libTrash(libSel); e.preventDefault();
  } else if (k === 'Enter') {
    const it = libItems[libSel];
    if (it) useSettingsFrom(it.path);
  }
}
document.addEventListener('keydown', libKeydown);

// Drag & drop an init image (reference main window drag-drop): OS
// files land in the init file input; gallery/library card images are
// fetched and re-wrapped so "use this result as the next init" is one
// gesture.
// Precedence rule (one rule everywhere): the most recent gesture wins.
// A drop sets droppedInit; picking a file afterwards clears it, so
// generate() and paintOpen() can both simply prefer droppedInit when
// it is non-null.
let droppedInit = null;   // b64 PNG, non-null => most recent gesture

function dropInit(b64, what) {
  droppedInit = b64;
  $('status').textContent = 'init image set from ' + what +
    ' (drag-drop); mode stays ' + $('mode').value;
  $('status').className = '';
}

$('init_file').addEventListener('change', () => { droppedInit = null; });

$('mode').addEventListener('change', () => {
  $('videobox').style.display =
    $('mode').value === 'image_to_video' ? '' : 'none';
});

document.addEventListener('dragover', e => e.preventDefault());
document.addEventListener('drop', async e => {
  e.preventDefault();
  const f = e.dataTransfer.files && e.dataTransfer.files[0];
  if (f && f.type.startsWith('image/')) {
    const b64 = await new Promise((res, rej) => {
      const r = new FileReader();
      r.onload = () => res(r.result.split(',')[1]);
      r.onerror = rej; r.readAsDataURL(f);
    });
    dropInit(b64, f.name);
    return;
  }
  const uri = e.dataTransfer.getData('text/uri-list') ||
              e.dataTransfer.getData('text/plain');
  if (uri && /^(data:image|https?:|\\/v1\\/)/.test(uri)) {
    try {
      if (uri.startsWith('data:image')) dropInit(uri.split(',')[1], 'card');
      else {
        const r = await fetch(uri);
        const blob = await r.blob();
        const b64 = await new Promise((res, rej) => {
          const rd = new FileReader();
          rd.onload = () => res(rd.result.split(',')[1]);
          rd.onerror = rej; rd.readAsDataURL(blob);
        });
        dropInit(b64, 'library image');
      }
    } catch (err) { $('status').textContent = String(err); }
  }
});

async function showTab(t) {
  tab = t;
  for (const n of ['results', 'library', 'tools', 'prefs'])
    $('tab-' + n).className = t === n ? 'active' : '';
  $('toolsec').style.display = t === 'tools' ? 'block' : 'none';
  $('prefsec').style.display = t === 'prefs' ? 'block' : 'none';
  $('libhelp').style.display = t === 'library' ? 'block' : 'none';
  $('gallery').style.display =
    (t === 'tools' || t === 'prefs') ? 'none' : 'flex';
  $('gallery').innerHTML = '';
  libItems = []; libSel = -1; libMark = -1;
  if (t === 'prefs') prefsLoad();
  if (t === 'library') {
    try {
      const l = await api('/v1/images');
      for (const it of l.images) {
        const p = it.path;
        const row = document.createElement('div');
        const fav = document.createElement('button');
        fav.className = 'small'; fav.textContent = '★ favorite';
        fav.onclick = () => api('/v1/images/favorite', {path: p});
        const del = document.createElement('button');
        del.className = 'small'; del.textContent = '🗑 trash';
        del.onclick = e => {
          const i = libItems.findIndex(x => x.path === p);
          if (i >= 0) libTrash(i); e.stopPropagation();
        };
        const use = document.createElement('button');
        use.className = 'small'; use.textContent = '↺ use settings';
        use.onclick = () => useSettingsFrom(p);
        row.appendChild(fav); row.appendChild(del); row.appendChild(use);
        addCard('/v1/images/file?path=' + encodeURIComponent(p), p, row);
        const card = $('gallery').firstChild;
        card.onclick = () => {
          const i = libItems.findIndex(x => x.path === p);
          if (i >= 0) libSelect(i);
        };
        // addCard prepends; keep libItems in on-screen order
        libItems.unshift({path: p, card});
      }
      if (libItems.length) { $('gallery').focus(); libSelect(0); }
    } catch (e) { $('status').textContent = String(e); }
  }
}

// Preferences editor over GET/POST /v1/preferences (reference
// ui/preferences_ui.py dialog).
let prefsOrig = {};

async function prefsLoad() {
  try {
    const out = await api('/v1/preferences');
    const prefs = out.preferences;
    $('pref_rows').innerHTML = '';
    prefsOrig = prefs || {};
    if (!prefs) {
      $('pref_state').textContent =
        'server started without a config (read-only)';
      return;
    }
    for (const [k, v] of Object.entries(prefs)) {
      const lab = document.createElement('label');
      lab.textContent = k;
      $('pref_rows').appendChild(lab);
      const inp = document.createElement(
        typeof v === 'boolean' ? 'select' : 'input');
      inp.id = 'pref_' + k;
      if (typeof v === 'boolean') {
        for (const o of ['true', 'false']) {
          const e = document.createElement('option'); e.textContent = o;
          inp.appendChild(e);
        }
        inp.value = String(v);
      } else {
        if (typeof v === 'number') inp.type = 'number';
        inp.value = v === null ? '' : String(v);
      }
      $('pref_rows').appendChild(inp);
    }
    $('pref_state').textContent = '';
  } catch (e) { $('pref_state').textContent = String(e); }
}

async function prefsSave() {
  const changed = {};
  for (const [k, v] of Object.entries(prefsOrig)) {
    const inp = $('pref_' + k);
    if (!inp) continue;
    let nv = inp.value;
    if (typeof v === 'boolean') nv = nv === 'true';
    else if (typeof v === 'number') {
      nv = Number(nv);          // handles '1e-4', '0.5', '12' alike
      if (Number.isNaN(nv)) {
        $('pref_state').textContent =
          'not a number: ' + k + ' — field skipped';
        continue;
      }
    }
    if (nv !== v && !(v === null && nv === '')) changed[k] = nv;
  }
  if (!Object.keys(changed).length) {
    $('pref_state').textContent = 'nothing changed'; return;
  }
  try {
    await api('/v1/preferences', changed);
    $('pref_state').textContent =
      'saved: ' + Object.keys(changed).join(', ');
    prefsLoad();
  } catch (e) { $('pref_state').textContent = String(e); }
}

async function mixRun() {
  const paths = $('mix_paths').value.split(',').map(s => s.trim())
    .filter(Boolean);
  const weights = $('mix_weights').value.split(',').map(parseFloat);
  try {
    const out = await api('/v1/tools/mix',
      {paths, weights, output: $('mix_output').value});
    $('mix_state').textContent = 'written: ' + out.output;
  } catch (e) { $('mix_state').textContent = String(e); }
}

boot();
</script>
</body>
</html>
"""
