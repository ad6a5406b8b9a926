// Minimal DOM/browser shim for executing the real SPA modules on jsrt
// (tests/integration/test_spa_exec.py) — the offline-image analog of
// vitest+jsdom. Implements exactly the surface the SPA's modules touch;
// anything else reads as undefined and fails the test loudly.

class ClassList {
  constructor(owner) { this.owner = owner; this.items = []; }
  sync() { this.owner._cls = this.items.join(" "); }
  add(...cs) {
    for (const c of cs) { if (!this.items.includes(c)) { this.items.push(c); } }
    this.sync();
  }
  remove(...cs) {
    this.items = this.items.filter(x => !cs.includes(x));
    this.sync();
  }
  toggle(c, force) {
    const has = this.items.includes(c);
    const want = force === undefined ? !has : force;
    if (want && !has) { this.add(c); }
    if (!want && has) { this.remove(c); }
    return want;
  }
  contains(c) { return this.items.includes(c); }
}

let nextId = 1;

class Element {
  constructor(tag) {
    this.tagName = (tag || "div").toUpperCase();
    this.children = [];
    this.parentNode = null;
    this.classList = new ClassList(this);
    this.className = "";
    this.id = "";
    this._text = "";
    this._html = "";
    this.style = {};
    this.dataset = {};
    this.attributes = {};
    this.value = "";
    this.checked = false;
    this.open = false;
    this.disabled = false;
    this.hidden = false;
    this.scrollTop = 0;
    this.scrollHeight = 0;
    this.clientHeight = 0;
    this.onclick = null;
    this.onchange = null;
    this.onsubmit = null;
    this.oninput = null;
    this._uid = nextId++;
  }
  appendChild(c) {
    if (c.parentNode) { c.parentNode.removeChild(c); }
    c.parentNode = this;
    this.children.push(c);
    return c;
  }
  insertBefore(c, ref) {
    if (c.parentNode) { c.parentNode.removeChild(c); }
    c.parentNode = this;
    const i = this.children.indexOf(ref);
    if (i < 0) { this.children.push(c); } else { this.children.splice(i, 0, c); }
    return c;
  }
  removeChild(c) {
    const i = this.children.indexOf(c);
    if (i >= 0) { this.children.splice(i, 1); c.parentNode = null; }
    return c;
  }
  replaceChild(newC, oldC) {
    this.insertBefore(newC, oldC);
    this.removeChild(oldC);
    return oldC;
  }
  remove() { if (this.parentNode) { this.parentNode.removeChild(this); } }
  replaceWith(other) {
    if (!this.parentNode) { return; }
    this.parentNode.insertBefore(other, this);
    this.remove();
  }
  get className() { return this._cls || ""; }
  set className(v) {
    this._cls = String(v);
    // keep classList in sync: el("div", "msg user") assigns className
    // directly and querySelector(".msg") must still match
    this.classList.items = this._cls.split(/\s+/).filter(c => c.length > 0);
  }
  get lastChild() { return this.children[this.children.length - 1] || null; }
  get textContent() { return this._text; }
  set textContent(v) { this._text = String(v); this.children = []; this._html = ""; }
  get innerHTML() { return this._html || this._text; }
  set innerHTML(v) { this._html = String(v); this.children = []; this._text = ""; }
  get firstElementChild() { return this.children[0] || null; }
  get lastElementChild() { return this.children[this.children.length - 1] || null; }
  get options() { return this.children.filter(c => c.tagName === "OPTION"); }
  get elements() {
    // form.elements named map (the MCP/project forms read by field name)
    const map = {};
    const walk = e => {
      for (const c of e.children) {
        const n = c.attributes && c.attributes.name;
        if (n) { map[n] = c; }
        walk(c);
      }
    };
    walk(this);
    return map;
  }
  setAttribute(k, v) {
    this.attributes[k] = String(v);
    // real DOM reflects these attributes onto properties
    if (k === "id") { this.id = v; }
    if (k === "name") { this.name = v; }
    if (k === "type") { this.type = v; }
  }
  getAttribute(k) { return this.attributes[k] !== undefined ? this.attributes[k] : null; }
  matches(sel) {
    // comma lists: match any branch (querySelectorAll("input[name], …"))
    if (sel.includes(",")) {
      return sel.split(",").some(s => this.matches(s.trim()));
    }
    if (sel.startsWith(".")) {
      // compound class selectors (".tl-dot.calling") require every class
      return sel.slice(1).split(".").every(c => this.classList.contains(c));
    }
    if (sel.startsWith("#")) { return this.id === sel.slice(1); }
    // tag[attr] presence selectors (the params drawer's input[name])
    const m = sel.match(/^(\w+)?\[([\w-]+)\]$/);
    if (m) {
      if (m[1] && this.tagName !== m[1].toUpperCase()) { return false; }
      return this.attributes[m[2]] !== undefined;
    }
    return this.tagName === sel.toUpperCase();
  }
  querySelector(sel) {
    for (const c of this.children) {
      if (c.matches(sel)) { return c; }
      const hit = c.querySelector(sel);
      if (hit) { return hit; }
    }
    return null;
  }
  querySelectorAll(sel) {
    const out = [];
    for (const c of this.children) {
      if (c.matches(sel)) { out.push(c); }
      out.push(...c.querySelectorAll(sel));
    }
    return out;
  }
  addEventListener(type, fn) { this["on" + type] = fn; }
  closest(sel) {
    let cur = this;
    while (cur) {
      if (cur.matches && cur.matches(sel)) { return cur; }
      cur = cur.parentNode;
    }
    return null;
  }
  contains(other) {
    let cur = other;
    while (cur) {
      if (cur === this) { return true; }
      cur = cur.parentNode;
    }
    return false;
  }
  focus() { }
  click() { if (this.onclick) { this.onclick({target: this, preventDefault: () => {}}); } }
  scrollIntoView() { }
}

const byId = new Map();

const documentShim = {
  createElement: tag => new Element(tag),
  createTextNode: text => {
    const e = new Element("span");
    e.textContent = text;
    return e;
  },
  getElementById: id => {
    // ids auto-create on first access: the SPA's markup shell guarantees
    // their existence in the browser; the shim guarantees it here
    if (!byId.has(id)) {
      const e = new Element("div");
      e.id = id;
      byId.set(id, e);
    }
    return byId.get(id);
  },
  querySelector: sel => {
    // "#id" and the "#id .cls" descendant form app.js uses
    const parts = sel.split(/\s+/);
    if (parts[0].startsWith("#")) {
      const root = documentShim.getElementById(parts[0].slice(1));
      if (parts.length === 1) { return root; }
      return root.querySelector(parts.slice(1).join(" "));
    }
    return null;
  },
  querySelectorAll: sel => {
    const parts = sel.split(/\s+/);
    if (parts.length === 2 && parts[0].startsWith("#")) {
      return documentShim.getElementById(parts[0].slice(1))
        .querySelectorAll(parts[1]);
    }
    return [];
  },
  body: new Element("body"),
  documentElement: new Element("html"),
  listeners: {},
  addEventListener: function(type, fn) {
    // real documents stack listeners; keep them ALL (module picker and
    // context-menu dismiss both register document click handlers)
    if (!documentShim.listeners[type]) { documentShim.listeners[type] = []; }
    documentShim.listeners[type].push(fn);
  },
  dispatchDocumentEvent: function(type, ev) {
    for (const fn of documentShim.listeners[type] || []) { fn(ev); }
  },
  createRange: () => ({selectNodeContents: () => {}, }),
};

class FakeFormData {
  constructor(form) {
    this.map = {};
    if (form && form.elements) {
      const els = form.elements;
      for (const k of Object.keys(els)) { this.map[k] = els[k].value || ""; }
    }
  }
  get(k) { return this.map[k] !== undefined ? this.map[k] : null; }
  append(k, v) { this.map[k] = v; }
}

class FakeWebSocket {
  constructor(url) {
    this.url = url;
    this.readyState = 1; // OPEN
    this.sent = [];
    this.onmessage = null;
    this.onclose = null;
    this.onopen = null;
    FakeWebSocket.instances.push(this);
  }
  send(data) { this.sent.push(data); }
  close() {
    this.readyState = 3;
    if (this.onclose) { this.onclose({}); }
  }
  receive(obj) {
    if (this.onmessage) { this.onmessage({data: JSON.stringify(obj)}); }
  }
}
FakeWebSocket.instances = [];

const storageMap = new Map();
const localStorageShim = {
  getItem: k => (storageMap.has(k) ? storageMap.get(k) : null),
  setItem: (k, v) => { storageMap.set(k, String(v)); },
  removeItem: k => { storageMap.delete(k); },
  clear: () => { storageMap.clear(); },
};

// fetch: every /api call resolves with a canned body; tests may override
// routes via fetchRoutes and inspect fetchLog.
const fetchLog = [];
const fetchRoutes = {};

function fetchShim(path, opts) {
  fetchLog.push({path, opts: opts || null});
  const body = fetchRoutes[path] !== undefined ? fetchRoutes[path] : {};
  return Promise.resolve({
    ok: true,
    status: 200,
    json: () => Promise.resolve(body),
    text: () => Promise.resolve(JSON.stringify(body)),
  });
}

export function install() {
  return {
    document: documentShim,
    location: {protocol: "http:", host: "127.0.0.1:8000", pathname: "/"},
    navigator: {clipboard: null},
    WebSocket: FakeWebSocket,
    FormData: FakeFormData,
    localStorage: localStorageShim,
    fetch: fetchShim,
    requestAnimationFrame: fn => setTimeout(fn, 0),
    __shim__: {
      byId, FakeWebSocket, fetchLog, fetchRoutes,
      getById: id => documentShim.getElementById(id),
      lastSocket: () => FakeWebSocket.instances[FakeWebSocket.instances.length - 1],
      docDispatch: (type, ev) => documentShim.dispatchDocumentEvent(type, ev),
      docBody: () => documentShim.body,
    },
  };
}
