/* Native kernel for deepex_spark.kernel.sentence_kernel.
 *
 * Three entry points:
 *
 * - beam_walks(...): exactly the walk enumeration of ``beam_search_ie``
 *   (reference kgm.py:358-421 semantics as pinned by the Python
 *   implementation and the kernel goldens/oracles): per-row stable argsort
 *   of the pruned attention matrix, shared direction-free first hop per
 *   start node, directed beam rounds with revisit/direction/cross-segment
 *   rules (bound hops always allowed, emitted at the bound's stable
 *   full-row rank), score/len beam prune with Python-stable ordering, then
 *   the min/max-len + threshold filter, 'mean'/'sum' ranking transform,
 *   stable descending sort and search_n cap.
 *
 * - ie_sentence(...): the walks PLUS canonical flip + triple assembly +
 *   per-sentence dedup accumulation + dedup ranking (kgm.py:58-144,
 *   171-265) fused in C, so the ~10-100x larger intermediate walk set
 *   never crosses into Python objects. String semantics (str.title,
 *   str.strip, ' '.join, .replace(' ##','')) are delegated to the CPython
 *   unicode API / method calls, so they are Python's own — not a
 *   reimplementation.
 *
 * - hash_accum(...): the signed feature-hash binning loop of
 *   operators/rerank._hash_embed (zlib-compatible crc32).
 *
 * Float arithmetic is performed in the same order as the Python path
 * (score accumulation left-to-right, mean = score/len at append, dedup
 * cum-score in emission order), so outputs are bit-identical — asserted by
 * tests/test_cbeam_parity.py and the driver's golden/oracle hashes.
 *
 * Pure CPython C API + buffer protocol; no numpy headers needed.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>
#include <stdlib.h>

#define MAX_N 256       /* matrix side; callers fall back to Python above this */
#define MASK_WORDS 4    /* 256-bit visited mask */

typedef struct {
    double score;
    double mean;
    uint64_t mask[MASK_WORDS];
    int32_t len;
    uint8_t visited;
    int16_t path[];     /* flexible: n entries max */
} Entry;

typedef struct {
    char *cursor;       /* bump allocator over the first-hop pool */
    size_t esize;       /* bytes per entry (header + n*int16, aligned) */
    int n;              /* matrix side */
    int topk;
    const double *att;  /* n*n row-major */
    int16_t *order;     /* n*n per-row stable argsort (desc val, asc idx) */
    int fh_count[MAX_N];
    char *fh_ent[MAX_N];
} Ctx;

static inline int mask_test(const uint64_t *m, int b) {
    return (int)((m[b >> 6] >> (b & 63)) & 1u);
}
static inline void mask_set(uint64_t *m, int b) {
    m[b >> 6] |= ((uint64_t)1) << (b & 63);
}

static inline Entry *ent_at(char *base, size_t esize, int i) {
    return (Entry *)(base + (size_t)i * esize);
}

/* ---- per-row stable argsort: descending value, ascending index on ties ---- */

typedef struct { double v; int16_t i; } VI;

static int cmp_vi(const void *a, const void *b) {
    const VI *x = (const VI *)a, *y = (const VI *)b;
    if (x->v > y->v) return -1;
    if (x->v < y->v) return 1;
    return (x->i < y->i) ? -1 : (x->i > y->i ? 1 : 0);
}

static void build_order(Ctx *c) {
    VI tmp[MAX_N];
    for (int r = 0; r < c->n; r++) {
        const double *row = c->att + (size_t)r * c->n;
        for (int j = 0; j < c->n; j++) { tmp[j].v = row[j]; tmp[j].i = (int16_t)j; }
        qsort(tmp, (size_t)c->n, sizeof(VI), cmp_vi); /* idx tiebreak => stable-equivalent */
        int16_t *out = c->order + (size_t)r * c->n;
        for (int j = 0; j < c->n; j++) out[j] = tmp[j].i;
    }
}

/* ---- stable insertion sort of entry pool slice by mean desc (small m) ---- */

static void isort_entries(char *base, size_t esize, int m, char *scratch) {
    for (int i = 1; i < m; i++) {
        Entry *cur = ent_at(base, esize, i);
        double key = cur->mean;
        int j = i - 1;
        if (ent_at(base, esize, j)->mean >= key) continue;
        memcpy(scratch, cur, esize);
        while (j >= 0 && ent_at(base, esize, j)->mean < key) {
            memcpy(ent_at(base, esize, j + 1), ent_at(base, esize, j), esize);
            j--;
        }
        memcpy(ent_at(base, esize, j + 1), scratch, esize);
    }
}

/* ---- first hop: direction-free, bound-free expansion of one start node ---- */

static int first_hop(Ctx *c, int node, char *out, char *scratch) {
    const int n = c->n, topk = c->topk;
    const double *row = c->att + (size_t)node * n;
    const int16_t *ord = c->order + (size_t)node * n;
    int m = 0;
    for (int k = 0; k < n && m < topk; k++) {
        int tgt = ord[k];
        if (tgt == node) continue; /* mask0 has only the start node */
        double ns = row[tgt];
        Entry *e = ent_at(out, c->esize, m);
        e->score = ns;
        e->mean = ns / 2.0;
        memset(e->mask, 0, sizeof(e->mask));
        mask_set(e->mask, node);
        mask_set(e->mask, tgt);
        e->len = 2;
        e->visited = 0;
        e->path[0] = (int16_t)node;
        e->path[1] = (int16_t)tgt;
        m++;
    }
    isort_entries(out, c->esize, m, scratch);
    return m;
}

static int get_first_hop(Ctx *c, int node, char *scratch) {
    if (c->fh_ent[node] == NULL) {
        c->fh_ent[node] = c->cursor;
        c->cursor += (size_t)c->topk * c->esize;
        c->fh_count[node] = first_hop(c, node, c->fh_ent[node], scratch);
    }
    return c->fh_count[node];
}

/* ---- growable pool of finished walk entries ---- */

typedef struct {
    char *data;
    size_t esize;
    int count;
    int cap;
} Pool;

static int pool_reserve(Pool *p, int extra) {
    if (p->count + extra > p->cap) {
        int ncap = p->cap ? p->cap * 2 : 1024;
        while (ncap < p->count + extra) ncap *= 2;
        char *nd = (char *)realloc(p->data, (size_t)ncap * p->esize);
        if (!nd) return -1;
        p->data = nd;
        p->cap = ncap;
    }
    return 0;
}

/* ---- one directed (node, bound) walk; appends finished beam to res ---- */

static int uni_beam(Ctx *c, int node, int bound, char *beam, char *newb,
                    char *scratch, Pool *res) {
    const int n = c->n, topk = c->topk;
    const size_t esize = c->esize;
    int bcount = get_first_hop(c, node, scratch);
    memcpy(beam, c->fh_ent[node], (size_t)bcount * esize);
    const int dir_right = bound > node;

    for (;;) {
        int all_visited = 1;
        for (int i = 0; i < bcount; i++)
            if (!ent_at(beam, esize, i)->visited) { all_visited = 0; break; }
        if (all_visited) break;

        int m = 0;
        for (int i = 0; i < bcount; i++) {
            Entry *e = ent_at(beam, esize, i);
            int v = e->path[e->len - 1];
            if (v == bound) {
                Entry *o = ent_at(newb, esize, m++);
                memcpy(o, e, esize);
                o->visited = 1;
                continue;
            }
            int plen1 = e->len + 1;
            int last = v;
            int check_cross = (last != node) && (last != bound);
            int loc_last = (last < node) + (last < bound);
            const double *row = c->att + (size_t)v * n;
            const int16_t *ord = c->order + (size_t)v * n;
            int tempk = 0;
            for (int k = 0; k < n && tempk < topk; k++) {
                int tgt = ord[k];
                if (tgt != bound) {
                    if (dir_right ? (tgt <= v) : (tgt >= v)) continue;
                    if (check_cross &&
                        ((tgt < node) + (tgt < bound)) != loc_last) continue;
                }
                if (mask_test(e->mask, tgt)) continue;
                double ns = e->score + row[tgt];
                Entry *o = ent_at(newb, esize, m++);
                o->score = ns;
                o->mean = ns / (double)plen1;
                memcpy(o->mask, e->mask, sizeof(o->mask));
                mask_set(o->mask, tgt);
                o->len = plen1;
                o->visited = 0;
                memcpy(o->path, e->path, (size_t)e->len * sizeof(int16_t));
                o->path[e->len] = (int16_t)tgt;
                tempk++;
            }
        }
        isort_entries(newb, esize, m, scratch);
        bcount = m < topk ? m : topk;
        memcpy(beam, newb, (size_t)bcount * esize);
    }
    if (pool_reserve(res, bcount) < 0) return -1;
    memcpy(res->data + (size_t)res->count * esize, beam, (size_t)bcount * esize);
    res->count += bcount;
    return 0;
}

/* ---- shared per-window machinery: context setup + pair enumeration ---- */

typedef struct {
    Ctx ctx;
    char *fh_pool, *beam, *newb, *scratch;
    Pool res;
} Walks;

static void walks_free(Walks *w) {
    free(w->ctx.order); free(w->fh_pool); free(w->beam); free(w->newb);
    free(w->scratch); free(w->res.data);
}

/* returns 0 ok, -1 with Python error set */
static int walks_run(Walks *w, PyObject *att_obj, int n, PyObject *segs_obj,
                     int topk, int dist_const, Py_buffer *view) {
    memset(w, 0, sizeof(*w));
    if (n < 1 || n > MAX_N) {
        PyErr_SetString(PyExc_ValueError, "matrix side out of range");
        return -1;
    }
    if (topk < 1 || topk > 128) {
        PyErr_SetString(PyExc_ValueError, "topk out of range");
        return -1;
    }
    if (PyObject_GetBuffer(att_obj, view, PyBUF_C_CONTIGUOUS) < 0) return -1;
    if (view->len != (Py_ssize_t)n * n * (Py_ssize_t)sizeof(double)) {
        PyBuffer_Release(view);
        view->buf = NULL;
        PyErr_SetString(PyExc_ValueError, "attention buffer size mismatch");
        return -1;
    }
    if (!PyList_Check(segs_obj)) {
        PyErr_SetString(PyExc_TypeError, "segs must be a list of lists");
        return -1;
    }
    Ctx *c = &w->ctx;
    memset(c->fh_ent, 0, sizeof(c->fh_ent));
    c->n = n;
    c->topk = topk;
    c->att = (const double *)view->buf;
    size_t esize = sizeof(Entry) + (size_t)n * sizeof(int16_t);
    esize = (esize + 15u) & ~(size_t)15u;
    c->esize = esize;
    c->order = (int16_t *)malloc((size_t)n * n * sizeof(int16_t));
    w->fh_pool = (char *)malloc((size_t)n * topk * esize);
    w->beam = (char *)malloc((size_t)topk * esize);
    w->newb = (char *)malloc((size_t)(topk * topk + topk) * esize);
    w->scratch = (char *)malloc(esize);
    w->res.esize = esize;
    if (!c->order || !w->fh_pool || !w->beam || !w->newb || !w->scratch) {
        PyErr_NoMemory();
        return -1;
    }
    c->cursor = w->fh_pool;
    build_order(c);

    Py_ssize_t nsegs = PyList_GET_SIZE(segs_obj);
    for (Py_ssize_t si = 0; si < nsegs; si++) {
        PyObject *seg = PyList_GET_ITEM(segs_obj, si);
        if (!PyList_Check(seg)) {
            PyErr_SetString(PyExc_TypeError, "segs must be a list of lists");
            return -1;
        }
        Py_ssize_t slen = PyList_GET_SIZE(seg);
        for (Py_ssize_t i = 0; i < slen; i++) {
            long u = PyLong_AsLong(PyList_GET_ITEM(seg, i));
            if (u < 0 || u >= n) {
                if (!PyErr_Occurred())
                    PyErr_SetString(PyExc_ValueError, "segment index out of range");
                return -1;
            }
            for (Py_ssize_t j = i - 1; j >= 0 && j >= i - dist_const; j--) {
                long b = PyLong_AsLong(PyList_GET_ITEM(seg, j));
                if (b < 0 || b >= n) {
                    if (!PyErr_Occurred())
                        PyErr_SetString(PyExc_ValueError, "segment index out of range");
                    return -1;
                }
                if (uni_beam(c, (int)u, (int)b, w->beam, w->newb, w->scratch,
                             &w->res) < 0) {
                    PyErr_NoMemory();
                    return -1;
                }
            }
            for (Py_ssize_t j = i + 1; j <= i + dist_const && j < slen; j++) {
                long b = PyLong_AsLong(PyList_GET_ITEM(seg, j));
                if (b < 0 || b >= n) {
                    if (!PyErr_Occurred())
                        PyErr_SetString(PyExc_ValueError, "segment index out of range");
                    return -1;
                }
                if (uni_beam(c, (int)u, (int)b, w->beam, w->newb, w->scratch,
                             &w->res) < 0) {
                    PyErr_NoMemory();
                    return -1;
                }
            }
        }
    }
    return 0;
}

/* ---- final filter + stable desc sort by transformed score ---- */

typedef struct { double s; int idx; } SI;

static int cmp_si(const void *a, const void *b) {
    const SI *x = (const SI *)a, *y = (const SI *)b;
    if (x->s > y->s) return -1;
    if (x->s < y->s) return 1;
    return (x->idx < y->idx) ? -1 : (x->idx > y->idx ? 1 : 0);
}

/* filter res by [min_len, max_len], transform score, threshold, sort desc
 * stable, cap at search_n; returns malloc'd SI array (caller frees) */
static SI *filter_sort(Pool *res, int min_len, int max_len, double threshold,
                       int ranking_mean, int search_n, int *out_nk) {
    SI *keep = (SI *)malloc((size_t)(res->count ? res->count : 1) * sizeof(SI));
    if (!keep) { PyErr_NoMemory(); return NULL; }
    int nk = 0;
    for (int i = 0; i < res->count; i++) {
        Entry *e = ent_at(res->data, res->esize, i);
        int L = e->len;
        if (L < min_len || L > max_len) continue;
        double s = ranking_mean ? e->score / (double)L : e->score;
        if (s > threshold) { keep[nk].s = s; keep[nk].idx = i; nk++; }
    }
    qsort(keep, (size_t)nk, sizeof(SI), cmp_si);
    if (search_n >= 0 && nk > search_n) nk = search_n;
    *out_nk = nk;
    return keep;
}

/* ============================ beam_walks ============================ */

static PyObject *beam_walks(PyObject *self, PyObject *args) {
    PyObject *att_obj, *segs_obj;
    int n, offset0, topk, dist_const, min_len, max_len, ranking_mean, search_n;
    double threshold;
    if (!PyArg_ParseTuple(args, "OiOiiiiidii", &att_obj, &n, &segs_obj,
                          &offset0, &topk, &dist_const, &min_len, &max_len,
                          &threshold, &ranking_mean, &search_n))
        return NULL;
    Py_buffer view;
    view.buf = NULL;
    Walks w;
    if (walks_run(&w, att_obj, n, segs_obj, topk, dist_const, &view) < 0) {
        walks_free(&w);
        if (view.buf) PyBuffer_Release(&view);
        return NULL;
    }
    int nk = 0;
    SI *keep = filter_sort(&w.res, min_len, max_len, threshold, ranking_mean,
                           search_n, &nk);
    PyObject *out = NULL;
    if (keep) {
        out = PyList_New(nk);
        for (int i = 0; out && i < nk; i++) {
            Entry *e = ent_at(w.res.data, w.res.esize, keep[i].idx);
            PyObject *path = PyTuple_New(e->len);
            if (!path) { Py_CLEAR(out); break; }
            for (int j = 0; j < e->len; j++) {
                PyObject *v = PyLong_FromLong((long)e->path[j] + offset0);
                if (!v) { Py_DECREF(path); Py_CLEAR(out); break; }
                PyTuple_SET_ITEM(path, j, v);
            }
            if (!out) break;
            PyObject *pair = Py_BuildValue("(Nd)", path, keep[i].s);
            if (!pair) { Py_CLEAR(out); break; }
            PyList_SET_ITEM(out, i, pair);
        }
        free(keep);
    }
    walks_free(&w);
    PyBuffer_Release(&view);
    return out;
}

/* ============================ ie_sentence ============================ */

/* conv cache: open-addressing hash table keyed by canonical local path */

typedef struct {
    PyObject *key;      /* borrowed-from-arena stripped trip key, or NULL */
    int hs, he, ts, te;
    uint8_t rejected;
} ConvVal;

typedef struct {
    uint32_t *hashes;
    int32_t *offs;      /* offset into path arena (int16 units), -1 = empty */
    int16_t *lens;
    ConvVal *vals;
    int cap;            /* power of two */
    int count;
    int16_t *arena;
    int arena_len, arena_cap;
} ConvMap;

static uint32_t fnv_path(const int16_t *p, int len) {
    uint32_t h = 2166136261u;
    const unsigned char *b = (const unsigned char *)p;
    for (int i = 0; i < len * 2; i++) { h ^= b[i]; h *= 16777619u; }
    return h;
}

static int convmap_init(ConvMap *m, int cap) {
    m->cap = cap; m->count = 0;
    m->hashes = (uint32_t *)malloc((size_t)cap * sizeof(uint32_t));
    m->offs = (int32_t *)malloc((size_t)cap * sizeof(int32_t));
    m->lens = (int16_t *)malloc((size_t)cap * sizeof(int16_t));
    m->vals = (ConvVal *)calloc((size_t)cap, sizeof(ConvVal));
    m->arena = NULL; m->arena_len = 0; m->arena_cap = 0;
    if (!m->hashes || !m->offs || !m->lens || !m->vals) {
        free(m->hashes); free(m->offs); free(m->lens); free(m->vals);
        memset(m, 0, sizeof(*m));
        return -1;
    }
    for (int i = 0; i < cap; i++) m->offs[i] = -1;
    return 0;
}

static void convmap_free(ConvMap *m) {
    if (m->vals)
        for (int i = 0; i < m->cap; i++) Py_XDECREF(m->vals[i].key);
    free(m->hashes); free(m->offs); free(m->lens); free(m->vals); free(m->arena);
}

static int convmap_grow(ConvMap *m) {
    int ncap = m->cap * 2;
    uint32_t *nh = (uint32_t *)malloc((size_t)ncap * sizeof(uint32_t));
    int32_t *no = (int32_t *)malloc((size_t)ncap * sizeof(int32_t));
    int16_t *nl = (int16_t *)malloc((size_t)ncap * sizeof(int16_t));
    ConvVal *nv = (ConvVal *)calloc((size_t)ncap, sizeof(ConvVal));
    if (!nh || !no || !nl || !nv) { free(nh); free(no); free(nl); free(nv); return -1; }
    for (int i = 0; i < ncap; i++) no[i] = -1;
    for (int i = 0; i < m->cap; i++) {
        if (m->offs[i] < 0) continue;
        uint32_t h = m->hashes[i];
        int slot = (int)(h & (uint32_t)(ncap - 1));
        while (no[slot] >= 0) slot = (slot + 1) & (ncap - 1);
        nh[slot] = h; no[slot] = m->offs[i]; nl[slot] = m->lens[i];
        nv[slot] = m->vals[i];
    }
    free(m->hashes); free(m->offs); free(m->lens); free(m->vals);
    m->hashes = nh; m->offs = no; m->lens = nl; m->vals = nv; m->cap = ncap;
    return 0;
}

/* find or insert; returns slot index, sets *found */
static int convmap_slot(ConvMap *m, const int16_t *p, int len, int *found) {
    if (m->count * 4 >= m->cap * 3 && convmap_grow(m) < 0) return -1;
    uint32_t h = fnv_path(p, len);
    int slot = (int)(h & (uint32_t)(m->cap - 1));
    for (;;) {
        if (m->offs[slot] < 0) { *found = 0; m->hashes[slot] = h; return slot; }
        if (m->hashes[slot] == h && m->lens[slot] == len &&
            memcmp(m->arena + m->offs[slot], p, (size_t)len * 2) == 0) {
            *found = 1;
            return slot;
        }
        slot = (slot + 1) & (m->cap - 1);
    }
}

static int convmap_store_path(ConvMap *m, int slot, const int16_t *p, int len) {
    if (m->arena_len + len > m->arena_cap) {
        int ncap = m->arena_cap ? m->arena_cap * 2 : 4096;
        while (ncap < m->arena_len + len) ncap *= 2;
        int16_t *na = (int16_t *)realloc(m->arena, (size_t)ncap * 2);
        if (!na) return -1;
        m->arena = na; m->arena_cap = ncap;
    }
    memcpy(m->arena + m->arena_len, p, (size_t)len * 2);
    m->offs[slot] = m->arena_len;
    m->lens[slot] = (int16_t)len;
    m->arena_len += len;
    m->count++;
    return 0;
}

/* dedup accumulator: PyDict key->index + parallel C arrays */

typedef struct {
    PyObject *dict;
    PyObject **keys;
    long *freq;
    double *score;
    long *attended;
    int *hs, *he, *ts, *te;
    int count, cap;
} Dedup;

static int dedup_init(Dedup *d) {
    memset(d, 0, sizeof(*d));
    d->dict = PyDict_New();
    return d->dict ? 0 : -1;
}

static void dedup_free(Dedup *d) {
    Py_XDECREF(d->dict);
    if (d->keys)
        for (int i = 0; i < d->count; i++) Py_XDECREF(d->keys[i]);
    free(d->keys); free(d->freq); free(d->score); free(d->attended);
    free(d->hs); free(d->he); free(d->ts); free(d->te);
}

static int dedup_reserve(Dedup *d) {
    if (d->count < d->cap) return 0;
    int ncap = d->cap ? d->cap * 2 : 256;
    PyObject **nk = (PyObject **)realloc(d->keys, (size_t)ncap * sizeof(PyObject *));
    long *nf = (long *)realloc(d->freq, (size_t)ncap * sizeof(long));
    double *ns = (double *)realloc(d->score, (size_t)ncap * sizeof(double));
    long *na = (long *)realloc(d->attended, (size_t)ncap * sizeof(long));
    int *nhs = (int *)realloc(d->hs, (size_t)ncap * sizeof(int));
    int *nhe = (int *)realloc(d->he, (size_t)ncap * sizeof(int));
    int *nts = (int *)realloc(d->ts, (size_t)ncap * sizeof(int));
    int *nte = (int *)realloc(d->te, (size_t)ncap * sizeof(int));
    if (!nk || !nf || !ns || !na || !nhs || !nhe || !nts || !nte) return -1;
    d->keys = nk; d->freq = nf; d->score = ns; d->attended = na;
    d->hs = nhs; d->he = nhe; d->ts = nts; d->te = nte; d->cap = ncap;
    return 0;
}

/* per-window feature views (borrowed references) */

typedef struct {
    PyObject *tokens;   /* list[str], len S */
    PyObject *names;    /* list[str], len S */
    int *span_s, *span_e;   /* len S, global char spans */
    uint8_t *iscont;        /* len S, token startswith '##' */
    PyObject **titles;      /* len S, lazily title()d names (owned) */
    int S;
    PyObject *sep_str;      /* shared " [SEP] " */
    PyObject *space_str;    /* shared " " */
    PyObject *hashhash;     /* shared " ##" */
    PyObject *empty_str;    /* shared "" */
} Feat;

/* relation_text + detok (kgm.py:58-121); returns new ref or NULL;
 * sets *rejected=1 (and returns NULL without error) when pruned away */
static PyObject *relation_text_c(Feat *f, const int16_t *p, int len, int off,
                                 int *rejected) {
    *rejected = 0;
    int hid = p[0] + off, tid = p[len - 1] + off;
    int hs = f->span_s[hid], he = f->span_e[hid];
    int ts = f->span_s[tid], te = f->span_e[tid];
    int first_rid = p[1] + off, last_rid = p[len - 2] + off;
    for (int i = 1; i < len - 2; i++) {
        int gi = p[i] + off;
        if (f->span_s[gi] == hs && f->span_e[gi] == he) first_rid = p[i + 1] + off;
        else break;
    }
    for (int i = len - 2; i > 1; i--) {
        int gi = p[i] + off;
        if (f->span_s[gi] == ts && f->span_e[gi] == te) last_rid = p[i - 1] + off;
        else break;
    }
    if (first_rid > last_rid) { *rejected = 1; return NULL; }
    /* _seq_offsets for first_rid and last_rid over [hid, tid] */
    int fp = 0, fn = 0, lp = 0, ln = 0;
    if (f->iscont[first_rid]) {
        fp = 1;
        for (int q = first_rid - 1; q >= hid; q--) {
            if (!f->iscont[q]) break;
            fp++;
        }
    }
    for (int q = first_rid + 1; q <= tid; q++) {
        if (!f->iscont[q]) break;
        fn++;
    }
    if (f->iscont[last_rid]) {
        lp = 1;
        for (int q = last_rid - 1; q >= hid; q--) {
            if (!f->iscont[q]) break;
            lp++;
        }
    }
    for (int q = last_rid + 1; q <= tid; q++) {
        if (!f->iscont[q]) break;
        ln++;
    }
    int first_pruned = first_rid, last_pruned = last_rid;
    if (first_rid - fp <= hid) first_pruned = first_rid + fn + 1;
    if (last_rid + ln >= tid) last_pruned = last_rid - lp - 1;
    if (first_pruned > last_pruned) { *rejected = 1; return NULL; }
    /* detokenize(tokens[first_pruned : last_pruned+1]) */
    PyObject *slice = PyList_GetSlice(f->tokens, first_pruned, last_pruned + 1);
    if (!slice) return NULL;
    PyObject *joined = PyUnicode_Join(f->space_str, slice);
    Py_DECREF(slice);
    if (!joined) return NULL;
    PyObject *replaced = PyUnicode_Replace(joined, f->hashhash, f->empty_str, -1);
    Py_DECREF(joined);
    if (!replaced) return NULL;
    PyObject *stripped = PyObject_CallMethod(replaced, "strip", NULL);
    Py_DECREF(replaced);
    return stripped;
}

static PyObject *get_title(Feat *f, int gi) {
    if (f->titles[gi] == NULL) {
        PyObject *name = PyList_GET_ITEM(f->names, gi);
        f->titles[gi] = PyObject_CallMethod(name, "title", NULL);
    }
    return f->titles[gi]; /* borrowed; NULL on error */
}

/* assemble one canonical path into the conv slot (kgm.py:124-144 +
 * accumulate's NIL-span rejection) */
static int assemble_into(Feat *f, ConvMap *cm, int slot, const int16_t *p,
                         int len, int off) {
    ConvVal *val = &cm->vals[slot];
    val->key = NULL;
    val->rejected = 1;
    if (len < 3) return 0;
    int hid = p[0] + off, tid = p[len - 1] + off;
    int hs = f->span_s[hid], he = f->span_e[hid];
    int ts = f->span_s[tid], te = f->span_e[tid];
    if (hs == ts && he == te) return 0;              /* same-span triple */
    if ((hs == -1 && he == -1) || (ts == -1 && te == -1)) return 0; /* NIL */
    int rej = 0;
    PyObject *rel = relation_text_c(f, p, len, off, &rej);
    if (!rel) return rej ? 0 : -1;
    PyObject *h = get_title(f, hid);
    PyObject *t = get_title(f, tid);
    if (!h || !t) { Py_DECREF(rel); return -1; }
    PyObject *trip = PyUnicode_FromFormat("%U [SEP] %U [SEP] %U", h, rel, t);
    Py_DECREF(rel);
    if (!trip) return -1;
    PyObject *key = PyObject_CallMethod(trip, "strip", NULL);
    Py_DECREF(trip);
    if (!key) return -1;
    val->key = key;  /* owned by the map */
    val->rejected = 0;
    val->hs = hs; val->he = he; val->ts = ts; val->te = te;
    return 0;
}

/* dedup ranking key (kgm.py:171-203) */
static double rank_key(int rtype, long freq, double score, long attended,
                       int wordcount) {
    switch (rtype) {
    case 0: return (double)freq;                       /* freq */
    case 1: return score;                              /* score */
    case 2: return score / (double)freq;               /* score_freq */
    case 3: return score / (double)(freq * wordcount); /* score_freq_len */
    default: return score / (double)attended;          /* score_len */
    }
}

static int count_words(PyObject *key) {
    /* len(key.split(" ")) == count of 0x20 bytes + 1 (key already stripped;
     * 0x20 never occurs inside a multi-byte UTF-8 sequence) */
    Py_ssize_t blen;
    const char *b = PyUnicode_AsUTF8AndSize(key, &blen);
    if (!b) return -1;
    int c = 1;
    for (Py_ssize_t i = 0; i < blen; i++)
        if (b[i] == ' ') c++;
    return c;
}

static PyObject *ie_sentence(PyObject *self, PyObject *args) {
    PyObject *windows;
    int topk, dist_const, min_len, max_len, ranking_mean, search_n;
    int rank_type, cand_min_len;
    double threshold;
    if (!PyArg_ParseTuple(args, "Oiiiidiiii", &windows, &topk, &dist_const,
                          &min_len, &max_len, &threshold, &ranking_mean,
                          &search_n, &rank_type, &cand_min_len))
        return NULL;
    if (!PyList_Check(windows)) {
        PyErr_SetString(PyExc_TypeError, "windows must be a list");
        return NULL;
    }

    Dedup dd;
    if (dedup_init(&dd) < 0) return NULL;

    PyObject *sep_str = PyUnicode_FromString(" [SEP] ");
    PyObject *space_str = PyUnicode_FromString(" ");
    PyObject *hashhash = PyUnicode_FromString(" ##");
    PyObject *empty_str = PyUnicode_FromString("");
    if (!sep_str || !space_str || !hashhash || !empty_str) goto fail_strs;

    Py_ssize_t nwin = PyList_GET_SIZE(windows);
    for (Py_ssize_t wi = 0; wi < nwin; wi++) {
        PyObject *win = PyList_GET_ITEM(windows, wi);
        PyObject *att_obj, *segs_obj, *tokens, *names, *spans;
        int n, offset0;
        if (!PyArg_ParseTuple(win, "OiOiOOO", &att_obj, &n, &segs_obj,
                              &offset0, &tokens, &names, &spans))
            goto fail_strs;
        if (!PyList_Check(tokens) || !PyList_Check(names) || !PyList_Check(spans)) {
            PyErr_SetString(PyExc_TypeError, "tokens/names/spans must be lists");
            goto fail_strs;
        }
        Py_ssize_t S = PyList_GET_SIZE(tokens);
        if (PyList_GET_SIZE(names) != S || PyList_GET_SIZE(spans) != S) {
            PyErr_SetString(PyExc_ValueError, "feature array length mismatch");
            goto fail_strs;
        }

        /* feature views */
        Feat f;
        f.tokens = tokens; f.names = names; f.S = (int)S;
        f.sep_str = sep_str; f.space_str = space_str;
        f.hashhash = hashhash; f.empty_str = empty_str;
        f.span_s = (int *)malloc((size_t)S * sizeof(int));
        f.span_e = (int *)malloc((size_t)S * sizeof(int));
        f.iscont = (uint8_t *)malloc((size_t)S);
        f.titles = (PyObject **)calloc((size_t)S, sizeof(PyObject *));
        if (!f.span_s || !f.span_e || !f.iscont || !f.titles) {
            free(f.span_s); free(f.span_e); free(f.iscont); free(f.titles);
            PyErr_NoMemory();
            goto fail_strs;
        }
        int feat_ok = 1;
        for (Py_ssize_t i = 0; i < S; i++) {
            PyObject *sp = PyList_GET_ITEM(spans, i);
            PyObject *s0 = PySequence_GetItem(sp, 0);
            PyObject *s1 = s0 ? PySequence_GetItem(sp, 1) : NULL;
            if (!s0 || !s1) { Py_XDECREF(s0); Py_XDECREF(s1); feat_ok = 0; break; }
            f.span_s[i] = (int)PyLong_AsLong(s0);
            f.span_e[i] = (int)PyLong_AsLong(s1);
            Py_DECREF(s0); Py_DECREF(s1);
            Py_ssize_t blen;
            const char *b = PyUnicode_AsUTF8AndSize(PyList_GET_ITEM(tokens, i), &blen);
            if (!b) { feat_ok = 0; break; }
            f.iscont[i] = (blen >= 2 && b[0] == '#' && b[1] == '#');
        }
        Walks w;
        memset(&w, 0, sizeof(w));
        Py_buffer view;
        view.buf = NULL;
        int run_ok = feat_ok && !PyErr_Occurred() &&
                     walks_run(&w, att_obj, n, segs_obj, topk, dist_const, &view) == 0;
        if (!feat_ok && !PyErr_Occurred())
            PyErr_SetString(PyExc_ValueError, "bad span/token entry");
        SI *keep = NULL;
        int nk = 0;
        ConvMap cm;
        memset(&cm, 0, sizeof(cm));
        int cm_init = 0;
        int cm_ok = 0;
        if (run_ok) {
            keep = filter_sort(&w.res, min_len, max_len, threshold,
                               ranking_mean, search_n, &nk);
            cm_init = keep && convmap_init(&cm, 1024) == 0;
            cm_ok = cm_init;
            if (keep && !cm_ok) PyErr_NoMemory();
        }
        int16_t canon[MAX_N];
        if (cm_ok) {
            for (int i = 0; i < nk; i++) {
                Entry *e = ent_at(w.res.data, w.res.esize, keep[i].idx);
                int len = e->len;
                /* canonical flip (IE mode): ascending endpoints */
                if (e->path[0] < e->path[len - 1]) {
                    memcpy(canon, e->path, (size_t)len * 2);
                } else {
                    for (int j = 0; j < len; j++) canon[j] = e->path[len - 1 - j];
                }
                double s = keep[i].s <= 1.0 ? keep[i].s : 1.0; /* kgm.py:234 clamp */
                int found = 0;
                int slot = convmap_slot(&cm, canon, len, &found);
                if (slot < 0) { PyErr_NoMemory(); cm_ok = 0; break; }
                if (!found) {
                    if (convmap_store_path(&cm, slot, canon, len) < 0) {
                        PyErr_NoMemory();
                        cm_ok = 0;
                        break;
                    }
                    if (assemble_into(&f, &cm, slot, canon, len, offset0) < 0) {
                        cm_ok = 0;
                        break;
                    }
                }
                ConvVal *cv = &cm.vals[slot];
                if (cv->rejected) continue;
                PyObject *idx_obj = PyDict_GetItem(dd.dict, cv->key); /* borrowed */
                if (idx_obj == NULL) {
                    if (dedup_reserve(&dd) < 0) { PyErr_NoMemory(); cm_ok = 0; break; }
                    int di = dd.count;
                    PyObject *iv = PyLong_FromLong(di);
                    if (!iv || PyDict_SetItem(dd.dict, cv->key, iv) < 0) {
                        Py_XDECREF(iv);
                        cm_ok = 0;
                        break;
                    }
                    Py_DECREF(iv);
                    Py_INCREF(cv->key);
                    dd.keys[di] = cv->key;
                    dd.freq[di] = 1;
                    dd.score[di] = s;
                    dd.attended[di] = len;
                    dd.hs[di] = cv->hs; dd.he[di] = cv->he;
                    dd.ts[di] = cv->ts; dd.te[di] = cv->te;
                    dd.count++;
                } else {
                    long di = PyLong_AsLong(idx_obj);
                    dd.freq[di] += 1;
                    dd.score[di] += s;
                    dd.attended[di] += len;
                }
            }
        }
        /* window cleanup */
        if (keep) free(keep);
        if (cm_init) convmap_free(&cm);
        walks_free(&w);
        if (view.buf) PyBuffer_Release(&view);
        for (Py_ssize_t i = 0; i < S; i++) Py_XDECREF(f.titles[i]);
        free(f.span_s); free(f.span_e); free(f.iscont); free(f.titles);
        if (!run_ok || !cm_ok || PyErr_Occurred()) goto fail_strs;
    }

    /* rank_candidates: stable sort desc by rank key, then cand_min_len */
    {
        int nd = dd.count;
        SI *order = (SI *)malloc((size_t)(nd ? nd : 1) * sizeof(SI));
        int *wc = (int *)malloc((size_t)(nd ? nd : 1) * sizeof(int));
        if (!order || !wc) { free(order); free(wc); PyErr_NoMemory(); goto fail_strs; }
        int ok = 1;
        for (int i = 0; i < nd; i++) {
            wc[i] = count_words(dd.keys[i]);
            if (wc[i] < 0) { ok = 0; break; }
            order[i].idx = i;
            order[i].s = rank_key(rank_type, dd.freq[i], dd.score[i],
                                  dd.attended[i], wc[i]);
        }
        if (!ok) { free(order); free(wc); goto fail_strs; }
        qsort(order, (size_t)nd, sizeof(SI), cmp_si);
        PyObject *out = PyList_New(0);
        if (!out) { free(order); free(wc); goto fail_strs; }
        for (int i = 0; i < nd; i++) {
            int di = order[i].idx;
            if (wc[di] < cand_min_len) continue;
            PyObject *row = Py_BuildValue(
                "(Oldiiiil)", dd.keys[di], dd.freq[di], dd.score[di],
                dd.hs[di], dd.he[di], dd.ts[di], dd.te[di], dd.attended[di]);
            if (!row || PyList_Append(out, row) < 0) {
                Py_XDECREF(row);
                Py_DECREF(out);
                free(order); free(wc);
                goto fail_strs;
            }
            Py_DECREF(row);
        }
        free(order); free(wc);
        Py_DECREF(sep_str); Py_DECREF(space_str);
        Py_DECREF(hashhash); Py_DECREF(empty_str);
        dedup_free(&dd);
        return out;
    }

fail_strs:
    Py_XDECREF(sep_str); Py_XDECREF(space_str);
    Py_XDECREF(hashhash); Py_XDECREF(empty_str);
    dedup_free(&dd);
    return NULL;
}

/* ---- signed feature-hash accumulation (operators/rerank._hash_embed) ---- */

static uint32_t crc_table[256];
static int crc_table_ready = 0;

static void crc_init(void) {
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t c = i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : (c >> 1);
        crc_table[i] = c;
    }
    crc_table_ready = 1;
}

static uint32_t crc32_bytes(const unsigned char *buf, Py_ssize_t len) {
    uint32_t c = 0xFFFFFFFFu;
    for (Py_ssize_t i = 0; i < len; i++)
        c = crc_table[(c ^ buf[i]) & 0xFFu] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

static PyObject *hash_accum(PyObject *self, PyObject *args) {
    PyObject *vec_obj, *tokens;
    if (!PyArg_ParseTuple(args, "OO", &vec_obj, &tokens)) return NULL;
    if (!crc_table_ready) crc_init();
    Py_buffer view;
    if (PyObject_GetBuffer(vec_obj, &view, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE) < 0)
        return NULL;
    Py_ssize_t dim = view.len / (Py_ssize_t)sizeof(double);
    if (dim <= 0) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "empty vector buffer");
        return NULL;
    }
    double *v = (double *)view.buf;
    if (!PyList_Check(tokens)) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_TypeError, "tokens must be a list of str");
        return NULL;
    }
    Py_ssize_t n = PyList_GET_SIZE(tokens);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *t = PyList_GET_ITEM(tokens, i);
        Py_ssize_t blen;
        const char *b = PyUnicode_AsUTF8AndSize(t, &blen);
        if (!b) { PyBuffer_Release(&view); return NULL; }
        uint32_t h = crc32_bytes((const unsigned char *)b, blen);
        v[h % (uint32_t)dim] += ((h >> 31) & 1u) ? 1.0 : -1.0;
    }
    PyBuffer_Release(&view);
    Py_RETURN_NONE;
}

/* Full _hash_embed accumulation: tokenize s exactly like
 * re.findall(r"\w+|[^\w\s]", s) — CPython's sre defines \w as
 * Py_UNICODE_ISALNUM(ch) || ch == '_' and \s as Py_UNICODE_ISSPACE (see
 * Modules/sre_lib.h SRE_UNI_IS_WORD / SRE_UNI_IS_SPACE), so the
 * classification below is the regex engine's own — then crc32-bin each
 * token's UTF-8 bytes into the caller's float64 buffer. Greedy \w+ runs
 * == maximal alnum/_ byte ranges; other non-space code points are
 * single-char tokens; spaces separate. */

static PyObject *hash_embed(PyObject *self, PyObject *args) {
    PyObject *vec_obj, *s;
    if (!PyArg_ParseTuple(args, "OU", &vec_obj, &s)) return NULL;
    if (!crc_table_ready) crc_init();
    Py_buffer view;
    if (PyObject_GetBuffer(vec_obj, &view, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE) < 0)
        return NULL;
    Py_ssize_t dim = view.len / (Py_ssize_t)sizeof(double);
    if (dim <= 0) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "empty vector buffer");
        return NULL;
    }
    double *v = (double *)view.buf;
    Py_ssize_t blen;
    const unsigned char *b = (const unsigned char *)PyUnicode_AsUTF8AndSize(s, &blen);
    if (!b) { PyBuffer_Release(&view); return NULL; }
    Py_ssize_t i = 0, word_start = -1;
    while (i <= blen) {
        Py_UCS4 cp = 0;
        int clen = 1;
        int at_end = (i == blen);
        if (!at_end) {
            unsigned char c0 = b[i];
            if (c0 < 0x80) { cp = c0; clen = 1; }
            else if ((c0 & 0xE0) == 0xC0) {
                cp = ((Py_UCS4)(c0 & 0x1F) << 6) | (b[i + 1] & 0x3F);
                clen = 2;
            } else if ((c0 & 0xF0) == 0xE0) {
                cp = ((Py_UCS4)(c0 & 0x0F) << 12) | ((Py_UCS4)(b[i + 1] & 0x3F) << 6)
                     | (b[i + 2] & 0x3F);
                clen = 3;
            } else {
                cp = ((Py_UCS4)(c0 & 0x07) << 18) | ((Py_UCS4)(b[i + 1] & 0x3F) << 12)
                     | ((Py_UCS4)(b[i + 2] & 0x3F) << 6) | (b[i + 3] & 0x3F);
                clen = 4;
            }
        }
        int is_word = !at_end && (Py_UNICODE_ISALNUM(cp) || cp == '_');
        if (is_word) {
            if (word_start < 0) word_start = i;
        } else {
            if (word_start >= 0) {
                uint32_t h = crc32_bytes(b + word_start, i - word_start);
                v[h % (uint32_t)dim] += ((h >> 31) & 1u) ? 1.0 : -1.0;
                word_start = -1;
            }
            if (!at_end && !Py_UNICODE_ISSPACE(cp)) {
                uint32_t h = crc32_bytes(b + i, clen);
                v[h % (uint32_t)dim] += ((h >> 31) & 1u) ? 1.0 : -1.0;
            }
        }
        if (at_end) break;
        i += clen;
    }
    PyBuffer_Release(&view);
    Py_RETURN_NONE;
}

static PyObject *crc32_py(PyObject *self, PyObject *args) {
    /* test hook: must agree with zlib.crc32 */
    const char *b;
    Py_ssize_t blen;
    if (!PyArg_ParseTuple(args, "y#", &b, &blen)) return NULL;
    if (!crc_table_ready) crc_init();
    return PyLong_FromUnsignedLong(crc32_bytes((const unsigned char *)b, blen));
}

static PyMethodDef Methods[] = {
    {"beam_walks", beam_walks, METH_VARARGS,
     "beam_walks(att, n, segs_local, offset0, topk, dist_const, min_len, "
     "max_len, threshold, ranking_mean, search_n) -> [(path_tuple, score)]"},
    {"ie_sentence", ie_sentence, METH_VARARGS,
     "ie_sentence(windows, topk, dist_const, min_len, max_len, threshold, "
     "ranking_mean, search_n, rank_type, cand_min_len) -> "
     "[(key, freq, score, hs, he, ts, te, attended)]"},
    {"hash_accum", hash_accum, METH_VARARGS,
     "hash_accum(float64_buffer, tokens) -> None; v[crc32(t)%dim] += ±1"},
    {"hash_embed", hash_embed, METH_VARARGS,
     "hash_embed(float64_buffer, s) -> None; tokenize like "
     "re.findall(r'\\w+|[^\\w\\s]') and crc32-bin each token"},
    {"crc32", crc32_py, METH_VARARGS, "zlib-compatible crc32 (test hook)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_cbeam", NULL, -1, Methods,
};

PyMODINIT_FUNC PyInit__cbeam(void) { return PyModule_Create(&moduledef); }
