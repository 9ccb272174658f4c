/* LZ77 match search over entropy token streams.
 *
 * Port of the hash-chain matcher + greedy-lazy emission of
 * lib/jxl/enc_ans.cc:1004-1370 (HashChain, ApplyLZ77_LZ77): replaces the
 * RLE-only transform for repetitive content (screenshots, flat art)
 * where real matches beat run-length coding. Cost model constants are
 * the reference's tuned tables (format-tuning constants).
 *
 * Plain C interface for ctypes; built into _jxl_native.so.
 */

#include <stdint.h>
#include <stddef.h>
#include <stdlib.h>
#include <string.h>

#define HASH_NUM_VALUES 32768
#define HASH_MASK (HASH_NUM_VALUES - 1)
#define HASH_SHIFT 5
#define MAX_CHAIN_LENGTH 256
#define MAX_WINDOW (1u << 20)

static const float kLenCost[17] = {
    2.797667318563126f,  3.213177690381199f,  2.5706009246743737f,
    2.408392498667534f,  2.829649191872326f,  3.3923087753324577f,
    4.029267451554331f,  4.415576699706408f,  4.509357574741465f,
    9.21481543803004f,   10.020590190114898f, 11.858671627804766f,
    12.45853300490526f,  11.713105831990857f, 12.561996324849314f,
    13.775477692278367f, 13.174027068768641f,
};

static const float kDistCost[139] = {
    6.368282626312716f,  5.680793277090298f,  8.347404197105247f,
    7.641619201599141f,  6.914328374119438f,  7.959808291537444f,
    8.70023120759855f,   8.71378518934703f,   9.379132523982769f,
    9.110472749092708f,  9.159029569270908f,  9.430936766731973f,
    7.278284055315169f,  7.8278514904267755f, 10.026641158289236f,
    9.976049229827066f,  9.64351607048908f,   9.563403863480442f,
    10.171474111762747f, 10.45950155077234f,  9.994813912104219f,
    10.322524683741156f, 8.465808729388186f,  8.756254166066853f,
    10.160930174662234f, 10.247329273413435f, 10.04090403724809f,
    10.129398517544082f, 9.342311691539546f,  9.07608009102374f,
    10.104799540677513f, 10.378079384990906f, 10.165828974075072f,
    10.337595322341553f, 7.940557464567944f,  10.575665823319431f,
    11.023344321751955f, 10.736144698831827f, 11.118277044595054f,
    7.468468230648442f,  10.738305230932939f, 10.906980780216568f,
    10.163468216353817f, 10.17805759656433f,  11.167283670483565f,
    11.147050200274544f, 10.517921919244333f, 10.651764778156886f,
    10.17074446448919f,  11.217636876224745f, 11.261630721139484f,
    11.403140815247259f, 10.892472096873417f, 11.1859607804481f,
    8.017346947551262f,  7.895143720278828f,  11.036577113822025f,
    11.170562110315794f, 10.326988722591086f, 10.40872184751056f,
    11.213498225466386f, 11.30580635516863f,  10.672272515665442f,
    10.768069466228063f, 11.145257364153565f, 11.64668307145549f,
    10.593156194627339f, 11.207499484844943f, 10.767517766396908f,
    10.826629811407042f, 10.737764794499988f, 10.6200448518045f,
    10.191315385198092f, 8.468384171390085f,  11.731295299170432f,
    11.824619886654398f, 10.41518844301179f,  10.16310536548649f,
    10.539423685097576f, 10.495136599328031f, 10.469112847728267f,
    11.72057686174922f,  10.910326337834674f, 11.378921834673758f,
    11.847759036098536f, 11.92071647623854f,  10.810628276345282f,
    11.008601085273893f, 11.910326337834674f, 11.949212023423133f,
    11.298614839104337f, 11.611603659010392f, 10.472930394619985f,
    11.835564720850282f, 11.523267392285337f, 12.01055816679611f,
    8.413029688994023f,  11.895784139536406f, 11.984679534970505f,
    11.220654278717394f, 11.716311684833672f, 10.61036646226114f,
    10.89849965960364f,  10.203762898863669f, 10.997560826267238f,
    11.484217379438984f, 11.792836176993665f, 12.24310468755171f,
    11.464858097919262f, 12.212747017409377f, 11.425595666074955f,
    11.572048533398757f, 12.742093965163013f, 11.381874288645637f,
    12.191870445817015f, 11.683156920035426f, 11.152442115262197f,
    11.90303691580457f,  11.653292787169159f, 11.938615382266098f,
    16.970641701570223f, 16.853602280380002f, 17.26240782594733f,
    16.644655390108507f, 17.14310889757499f,  16.910935455445955f,
    17.505678976959697f, 17.213498225466388f, 2.4162310293553024f,
    3.494587244462329f,  3.5258600986408344f, 3.4959806589517095f,
    3.098390886949687f,  3.343454654302911f,  3.588847442290287f,
    4.14614790111827f,   5.152948641990529f,  7.433696808092598f,
    9.716311684833672f,
};

/* HybridUintConfig(split_exp, 0, 0).Encode */
static inline void hybrid_encode(uint32_t value, int split_exp,
                                 uint32_t* token, uint32_t* nbits) {
  uint32_t split = 1u << split_exp;
  if (value < split) {
    *token = value;
    *nbits = 0;
    return;
  }
  int bl = 0;
  uint32_t v = value;
  while (v >> bl) bl++;
  uint32_t n = (uint32_t)(bl - 1);
  *token = split + (n - split_exp);
  *nbits = n;
}

static inline float len_cost(uint32_t len) {
  uint32_t tok, nbits;
  hybrid_encode(len, 1, &tok, &nbits);
  if (tok > 16) tok = 16;
  return kLenCost[tok] + nbits;
}

static inline float dist_cost(uint32_t dist) {
  uint32_t tok, nbits;
  hybrid_encode(dist, 7, &tok, &nbits);
  if (tok > 138) tok = 138;
  return kDistCost[tok] + nbits;
}

typedef struct {
  const uint32_t* data;
  uint32_t size;
  uint32_t window_size, window_mask;
  uint32_t min_length;
  int* head;
  uint32_t* chain;
  int* val;
  int* headz;
  uint32_t* chainz;
  uint32_t* zeros;
  uint32_t numzeros;
  const int32_t* special_lookup;  /* dist -> symbol, -1 none */
  int special_max;
  int num_special;
} Chain;

static inline uint32_t get_hash(const Chain* c, uint32_t pos) {
  if (pos + 2 < c->size) {
    uint32_t r = (c->data[pos] << 0) ^ (c->data[pos + 1] << HASH_SHIFT) ^
                 (c->data[pos + 2] << (HASH_SHIFT * 2));
    return r & HASH_MASK;
  }
  return 0;
}

static inline uint32_t count_zeros(const Chain* c, uint32_t pos,
                                   uint32_t prevzeros) {
  uint32_t end = pos + c->window_size;
  if (end > c->size) end = c->size;
  if (prevzeros > 0) {
    if (prevzeros >= c->window_mask && c->data[end - 1] == 0 &&
        end == pos + c->window_size) {
      return prevzeros;
    }
    return prevzeros - 1;
  }
  uint32_t num = 0;
  while (pos + num < end && c->data[pos + num] == 0) num++;
  return num;
}

static void chain_update(Chain* c, uint32_t pos) {
  uint32_t hashval = get_hash(c, pos);
  uint32_t wpos = pos & c->window_mask;
  c->val[wpos] = (int)hashval;
  if (c->head[hashval] != -1) c->chain[wpos] = (uint32_t)c->head[hashval];
  c->head[hashval] = (int)wpos;
  if (pos > 0 && c->data[pos] != c->data[pos - 1]) c->numzeros = 0;
  c->numzeros = count_zeros(c, pos, c->numzeros);
  c->zeros[wpos] = c->numzeros;
  if (c->headz[c->numzeros] != -1)
    c->chainz[wpos] = (uint32_t)c->headz[c->numzeros];
  c->headz[c->numzeros] = (int)wpos;
}

static void chain_find_match(const Chain* c, uint32_t pos,
                             uint32_t* result_dist_symbol,
                             uint32_t* result_len) {
  uint32_t wpos = pos & c->window_mask;
  uint32_t hashval = get_hash(c, pos);
  uint32_t hashpos = c->chain[wpos];
  int prev_dist = 0;
  uint32_t end = c->size;  /* max_length = in.size() */
  uint32_t chainlength = 0;
  uint32_t best_len = 0;
  *result_dist_symbol = 0;
  *result_len = 1;
  for (;;) {
    int dist = (hashpos <= wpos)
                   ? (int)(wpos - hashpos)
                   : (int)(wpos - hashpos + c->window_mask + 1);
    if (dist < prev_dist) break;
    prev_dist = dist;
    uint32_t len = 0;
    if (dist > 0) {
      uint32_t i = pos;
      uint32_t j = pos - (uint32_t)dist;
      if (c->numzeros > 3) {
        uint32_t r = c->numzeros - 1;
        if (c->zeros[hashpos] < r) r = c->zeros[hashpos];
        if (i + r >= end) r = end - i - 1;
        i += r;
        j += r;
      }
      while (i < end && c->data[i] == c->data[j]) {
        i++;
        j++;
      }
      len = i - pos;
      if (len >= c->min_length && len + 2 >= best_len) {
        int dist_symbol;
        if (dist <= c->special_max && c->special_lookup[dist] >= 0) {
          dist_symbol = c->special_lookup[dist];
        } else {
          dist_symbol = c->num_special + dist - 1;
        }
        if (len > *result_len ||
            (len == *result_len &&
             *result_dist_symbol > (uint32_t)dist_symbol)) {
          *result_len = len;
          *result_dist_symbol = (uint32_t)dist_symbol;
        }
        if (len > best_len) best_len = len;
      }
    }
    chainlength++;
    if (chainlength >= MAX_CHAIN_LENGTH) break;
    if (c->numzeros >= 3 && len > c->numzeros) {
      if (hashpos == c->chainz[hashpos]) break;
      hashpos = c->chainz[hashpos];
      if (c->zeros[hashpos] != c->numzeros) break;
    } else {
      if (hashpos == c->chain[hashpos]) break;
      hashpos = c->chain[hashpos];
      if (c->val[hashpos] != (int)hashval) break;
    }
  }
}

/* Greedy-lazy match emission (ApplyLZ77_LZ77, enc_ans.cc:1290-1370).
 * Outputs accepted matches; literals are the gaps. Returns the number of
 * matches, or -1 on allocation failure.
 * cum_cost: f32[n+1] cumulative literal bit costs.
 * dist_ctx_cost: estimated bits for one distance-context symbol. */
int lz77_find_matches(const uint32_t* vals, uint32_t n,
                      const float* cum_cost, float dist_ctx_cost,
                      uint32_t min_length,
                      const int32_t* special_lookup, int special_max,
                      int num_special,
                      uint32_t* m_pos, uint32_t* m_len, uint32_t* m_dist,
                      float* bit_decrease_out) {
  uint32_t window = 1;
  while (window < n && window < MAX_WINDOW) window <<= 1;
  Chain c;
  c.data = vals;
  c.size = n;
  c.window_size = window;
  c.window_mask = window - 1;
  c.min_length = min_length;
  c.special_lookup = special_lookup;
  c.special_max = special_max;
  c.num_special = num_special;
  c.numzeros = 0;
  c.head = (int*)malloc(HASH_NUM_VALUES * sizeof(int));
  c.val = (int*)malloc(window * sizeof(int));
  c.chain = (uint32_t*)malloc(window * sizeof(uint32_t));
  c.headz = (int*)malloc((window + 1) * sizeof(int));
  c.chainz = (uint32_t*)malloc(window * sizeof(uint32_t));
  c.zeros = (uint32_t*)malloc(window * sizeof(uint32_t));
  if (!c.head || !c.val || !c.chain || !c.headz || !c.chainz || !c.zeros) {
    free(c.head); free(c.val); free(c.chain);
    free(c.headz); free(c.chainz); free(c.zeros);
    return -1;
  }
  memset(c.head, -1, HASH_NUM_VALUES * sizeof(int));
  memset(c.headz, -1, (window + 1) * sizeof(int));
  for (uint32_t i = 0; i < window; i++) {
    c.val[i] = -1;
    c.chain[i] = i;
    c.chainz[i] = i;
  }

  const uint32_t max_lazy_match_len = 256;
  float bit_decrease = 0;
  int n_matches = 0;
  int already_updated = 0;
  for (uint32_t i = 0; i < n; i++) {
    if (!already_updated) chain_update(&c, i);
    already_updated = 0;
    uint32_t len, dist_symbol;
    chain_find_match(&c, i, &dist_symbol, &len);
    if (len >= min_length) {
      if (len < max_lazy_match_len && i + 1 < n) {
        chain_update(&c, i + 1);
        already_updated = 1;
        uint32_t len2, dist2;
        chain_find_match(&c, i + 1, &dist2, &len2);
        if (len2 > len) {
          ++i;
          already_updated = 0;
          len = len2;
          dist_symbol = dist2;
        }
      }
      float cost = cum_cost[i + len] - cum_cost[i];
      float lz77_cost = len_cost(len - min_length) +
                        dist_cost(dist_symbol) + dist_ctx_cost;
      if (lz77_cost <= cost) {
        m_pos[n_matches] = i;
        m_len[n_matches] = len;
        m_dist[n_matches] = dist_symbol;
        n_matches++;
        bit_decrease += cost - lz77_cost;
      }
      if (already_updated) {
        for (uint32_t k = 0; k < len - 2; k++) chain_update(&c, i + 2 + k);
        already_updated = 0;
      } else {
        for (uint32_t k = 0; k < len - 1; k++) chain_update(&c, i + 1 + k);
      }
      i += len - 1;
    }
  }
  free(c.head); free(c.val); free(c.chain);
  free(c.headz); free(c.chainz); free(c.zeros);
  *bit_decrease_out = bit_decrease;
  return n_matches;
}

/* ---- optimal matching (ApplyLZ77_Optimal, enc_ans.cc:1376-1470) ---- */

/* HybridUintConfig(split_exp, msb, lsb).Encode */
static inline void hybrid_encode2(uint32_t value, int split_exp, int msb,
                                  int lsb, uint32_t* token, uint32_t* nbits) {
  uint32_t split = 1u << split_exp;
  if (value < split) {
    *token = value;
    *nbits = 0;
    return;
  }
  int bl = 0;
  uint32_t v = value;
  while (v >> bl) bl++;
  uint32_t nn = (uint32_t)(bl - 1);
  uint32_t m = value - (1u << nn);
  *token = split + ((((nn - (uint32_t)split_exp) << (msb + lsb)) +
                     ((m >> (nn - msb)) << lsb) + (m & ((1u << lsb) - 1))));
  *nbits = nn - msb - lsb;
}

/* All matches at pos: record the lowest distance symbol per length in
 * dist_for_len[min_length..*max_len]; mirrors the FindMatches callback +
 * suffix-min pass of ApplyLZ77_Optimal. */
static void chain_find_all(const Chain* c, uint32_t pos,
                           uint32_t* dist_for_len, uint32_t* max_len_out) {
  uint32_t wpos = pos & c->window_mask;
  uint32_t hashval = get_hash(c, pos);
  uint32_t hashpos = c->chain[wpos];
  int prev_dist = 0;
  uint32_t end = c->size;
  uint32_t chainlength = 0;
  uint32_t cur_max = 0;
  for (;;) {
    int dist = (hashpos <= wpos)
                   ? (int)(wpos - hashpos)
                   : (int)(wpos - hashpos + c->window_mask + 1);
    if (dist < prev_dist) break;
    prev_dist = dist;
    uint32_t len = 0;
    if (dist > 0) {
      uint32_t i = pos;
      uint32_t j = pos - (uint32_t)dist;
      if (c->numzeros > 3) {
        uint32_t r = c->numzeros - 1;
        if (c->zeros[hashpos] < r) r = c->zeros[hashpos];
        if (i + r >= end) r = end - i - 1;
        i += r;
        j += r;
      }
      while (i < end && c->data[i] == c->data[j]) {
        i++;
        j++;
      }
      len = i - pos;
      if (len >= c->min_length) {
        uint32_t dist_symbol;
        if (dist <= c->special_max && c->special_lookup[dist] >= 0) {
          dist_symbol = (uint32_t)c->special_lookup[dist];
        } else {
          dist_symbol = (uint32_t)(c->num_special + dist - 1);
        }
        if (len > cur_max) {
          for (uint32_t k = cur_max + 1; k <= len; k++)
            dist_for_len[k] = dist_symbol;
          cur_max = len;
        }
        if (dist_symbol < dist_for_len[len]) dist_for_len[len] = dist_symbol;
      }
    }
    chainlength++;
    if (chainlength >= MAX_CHAIN_LENGTH) break;
    if (c->numzeros >= 3 && len > c->numzeros) {
      if (hashpos == c->chainz[hashpos]) break;
      hashpos = c->chainz[hashpos];
      if (c->zeros[hashpos] != c->numzeros) break;
    } else {
      if (hashpos == c->chain[hashpos]) break;
      hashpos = c->chain[hashpos];
      if (c->val[hashpos] != (int)hashval) break;
    }
  }
  /* suffix-min: best (lowest) distance symbol for >= each length */
  if (cur_max >= c->min_length) {
    uint32_t best = dist_for_len[cur_max];
    for (uint32_t j = cur_max; j >= c->min_length; j--) {
      if (dist_for_len[j] < best) best = dist_for_len[j];
      dist_for_len[j] = best;
      if (j == 0) break;
    }
  }
  *max_len_out = cur_max;
}

#define LEN_TOK_TABLE 32

int lz77_optimal(const uint32_t* vals, const int32_t* ctxs, uint32_t n,
                 const float* lit_cum, const float* len_tok_cost, int num_ctx,
                 int len_split_exp, int len_msb, int len_lsb,
                 const float* dist_tok_cost, int ndist_tok, int dist_split_exp,
                 int dist_msb, int dist_lsb, uint32_t min_length,
                 const int32_t* special_lookup, int special_max,
                 int num_special, uint32_t* m_pos, uint32_t* m_len,
                 uint32_t* m_dist, float* bits_out) {
  uint32_t window = 1;
  while (window < n && window < MAX_WINDOW) window <<= 1;
  Chain c;
  c.data = vals;
  c.size = n;
  c.window_size = window;
  c.window_mask = window - 1;
  c.min_length = min_length;
  c.special_lookup = special_lookup;
  c.special_max = special_max;
  c.num_special = num_special;
  c.numzeros = 0;
  c.head = (int*)malloc(HASH_NUM_VALUES * sizeof(int));
  c.val = (int*)malloc(window * sizeof(int));
  c.chain = (uint32_t*)malloc(window * sizeof(uint32_t));
  c.headz = (int*)malloc((window + 1) * sizeof(int));
  c.chainz = (uint32_t*)malloc(window * sizeof(uint32_t));
  c.zeros = (uint32_t*)malloc(window * sizeof(uint32_t));
  float* cost = (float*)malloc((n + 1) * sizeof(float));
  uint32_t* plen = (uint32_t*)malloc((n + 1) * sizeof(uint32_t));
  uint32_t* pdist = (uint32_t*)malloc((n + 1) * sizeof(uint32_t));
  uint32_t* dfl = (uint32_t*)malloc((n + 2) * sizeof(uint32_t));
  if (!c.head || !c.val || !c.chain || !c.headz || !c.chainz || !c.zeros ||
      !cost || !plen || !pdist || !dfl) {
    free(c.head); free(c.val); free(c.chain); free(c.headz); free(c.chainz);
    free(c.zeros); free(cost); free(plen); free(pdist); free(dfl);
    return -1;
  }
  memset(c.head, -1, HASH_NUM_VALUES * sizeof(int));
  memset(c.headz, -1, (window + 1) * sizeof(int));
  for (uint32_t i = 0; i < window; i++) {
    c.val[i] = -1;
    c.chain[i] = i;
    c.chainz[i] = i;
  }
  for (uint32_t i = 0; i <= n; i++) {
    cost[i] = 3.4e38f;
    plen[i] = 1;
    pdist[i] = 0;
  }
  cost[0] = 0.0f;
  uint32_t rle_length = 0, skip_lz77 = 0;
  for (uint32_t i = 0; i < n; i++) {
    chain_update(&c, i);
    float lit = cost[i] + (lit_cum[i + 1] - lit_cum[i]);
    if (cost[i + 1] > lit) {
      cost[i + 1] = lit;
      plen[i + 1] = 1;
      pdist[i + 1] = 0;
    }
    if (skip_lz77 > 0) {
      skip_lz77--;
      continue;
    }
    uint32_t max_len = 0;
    chain_find_all(&c, i, dfl, &max_len);
    if (max_len < min_length) continue;
    int ci = ctxs[i];
    if (ci < 0 || ci >= num_ctx) ci = 0;
    const float* lct = len_tok_cost + (size_t)ci * LEN_TOK_TABLE;
    /* Relax every length up to 64; beyond that the length-token cost is
     * flat within a hybrid-uint class, so only class-boundary lengths
     * and the maximum are candidates worth relaxing (keeps the DP from
     * going quadratic on highly repetitive streams). */
    uint32_t dense_end = max_len < 64 ? max_len : 64;
    for (uint32_t j = min_length; j <= max_len;) {
      uint32_t ltok, lnb, dtok, dnb;
      hybrid_encode2(j - min_length, len_split_exp, len_msb, len_lsb, &ltok,
                     &lnb);
      if (ltok >= LEN_TOK_TABLE) ltok = LEN_TOK_TABLE - 1;
      hybrid_encode2(dfl[j], dist_split_exp, dist_msb, dist_lsb, &dtok, &dnb);
      if ((int)dtok >= ndist_tok) dtok = (uint32_t)(ndist_tok - 1);
      float lz_cost = lct[ltok] + lnb + dist_tok_cost[dtok] + dnb;
      float total = cost[i] + lz_cost;
      if (cost[i + j] > total) {
        cost[i + j] = total;
        plen[i + j] = j;
        pdist[i + j] = dfl[j] + 1;
      }
      if (j <= dense_end) {
        j++;
      } else if (j >= max_len) {
        break;
      } else {
        j += (j >> 3) + 1; /* ~12% steps through the flat-cost region */
        if (j > max_len) j = max_len;
      }
    }
    /* avoid quadratic behavior inside long runs of one symbol */
    int is_rle = (c.num_special == 0 && dfl[max_len] == 0) ||
                 (c.num_special != 0 && dfl[max_len] == 1);
    if (is_rle) {
      rle_length++;
    } else {
      rle_length = 0;
    }
    if (rle_length >= 8 && max_len > 8) {
      skip_lz77 = max_len - 9;
      rle_length = 0;
    }
  }
  /* backtrack (matches in reverse, then reverse in place) */
  int nm = 0;
  uint32_t pos = n;
  while (pos > 0) {
    if (pdist[pos] != 0) {
      uint32_t L = plen[pos];
      m_pos[nm] = pos - L;
      m_len[nm] = L;
      m_dist[nm] = pdist[pos] - 1;
      nm++;
      pos -= L;
    } else {
      pos -= plen[pos];
    }
  }
  for (int a = 0, b = nm - 1; a < b; a++, b--) {
    uint32_t t;
    t = m_pos[a]; m_pos[a] = m_pos[b]; m_pos[b] = t;
    t = m_len[a]; m_len[a] = m_len[b]; m_len[b] = t;
    t = m_dist[a]; m_dist[a] = m_dist[b]; m_dist[b] = t;
  }
  *bits_out = cost[n];
  free(c.head); free(c.val); free(c.chain); free(c.headz); free(c.chainz);
  free(c.zeros); free(cost); free(plen); free(pdist); free(dfl);
  return nm;
}
