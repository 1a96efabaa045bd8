// Independent plain-JDK golden generator for the FBF-dynamic and
// RBF-weighted encoding driver queries (pprl_encode_fbf_dynamic /
// pprl_encode_rbf_weighted), over the same fixed fixture input as
// gen_pprl_golden.java (tests/golden/pprl_input.csv).
//
// Semantics mirrored from the reference (no code copied):
//  - properString / q-grams:    lib/qgram/QGramUtil.java:23-29,201-216
//  - q-gram count (D2 input):   QGramUtil.calcQgramsCount — count =
//    max(len(proper) - Q + 1, 0), empty source -> 0
//  - dynamic FBF size:          lib/encoding/FieldBloomFilterEncoding.java:318-348
//    ceil(1 / (1 - 0.5^(1/(g*K)))) from the field's average q-gram count g
//  - V3 keyed double hashing:   lib/encoding/BloomFilter.java:184-194
//  - FBF layout:                lib/encoding/FieldBloomFilterEncoding.java:181-215
//    per-field BF (cleared between fields), concatenated in field order
//  - weighted RBF size:         lib/encoding/RowBloomFilterEncoding.java:398-405
//    rbfN = max_i((int)(fbfN_i / w_i)); composition c_i = (int)(w_i * rbfN)
//    with NO remainder redistribution (RowBloomFilterEncoding.java:86-90,
//    141-144) — permutation slots beyond sum(c_i) stay unset (0)
//  - RBF bit selection/permute: RowBloomFilterEncoding.java:296-329,352-388
//    per-field Random(seed_i).nextInt(fbfN_i) draw stream; destination =
//    Collections.shuffle([0..rbfN), Random(permSeed))
//
// The three encoded fields are DERIVED from the fixture columns exactly as
// the Spark query derives them: path = uid between ':' and last '@',
// lang = path extension, content24 = first 24 chars of content.
//
// Usage: javac gen_pprl_enc_golden.java && java gen_pprl_enc_golden <golden_dir>
import javax.crypto.Mac;
import javax.crypto.spec.SecretKeySpec;
import java.io.*;
import java.nio.charset.StandardCharsets;
import java.nio.file.*;
import java.security.MessageDigest;
import java.util.*;

public class gen_pprl_enc_golden {
    static final int K = 3, Q = 2;
    static final double[] WEIGHTS = {0.4, 0.2, 0.4};
    static final long[] SELECTION_SEEDS = {5, 7, 11};
    static final long PERM_SEED = 13;
    // FBF-static: the factory's fixed per-field size variant
    // (BloomFilterEncodingUtil.java:141-190, "STATIC" N)
    static final int STATIC_N = 128;

    static Mac SHA1, MD5;
    // cache key must include N: per-field filters have different sizes
    static final Map<String, int[]> HASH_CACHE = new HashMap<>();

    public static void main(String[] args) throws Exception {
        Path dir = Paths.get(args.length > 0 ? args[0] : "tests/golden");
        SHA1 = Mac.getInstance("HmacSHA1");
        SHA1.init(new SecretKeySpec("ZIKRETQI".getBytes(), "HmacSHA1"));
        MD5 = Mac.getInstance("HmacMD5");
        MD5.init(new SecretKeySpec("ZIKRETQI".getBytes(), "HmacMD5"));

        // ---- read input, derive the three encoded fields --------------------
        List<String> uids = new ArrayList<>();
        Map<String, String[]> fields = new HashMap<>();
        try (BufferedReader br = Files.newBufferedReader(dir.resolve("pprl_input.csv"))) {
            String line = br.readLine(); // header
            while ((line = br.readLine()) != null) {
                int c1 = line.indexOf(','), c2 = line.indexOf(',', c1 + 1);
                String uid = line.substring(0, c1);
                String content = new String(
                        Base64.getDecoder().decode(line.substring(c2 + 1)), StandardCharsets.UTF_8);
                String path = uid.substring(uid.indexOf(':') + 1, uid.lastIndexOf('@'));
                String lang = path.substring(path.lastIndexOf('.') + 1);
                // codepoint-based first-24, matching Spark F.substring over
                // UTF8String (Java String.substring counts UTF-16 units and
                // would silently diverge on non-BMP content)
                StringBuilder c24 = new StringBuilder();
                content.codePoints().limit(24).forEach(c24::appendCodePoint);
                String content24 = c24.toString();
                uids.add(uid);
                fields.put(uid, new String[]{path, lang, content24});
            }
        }
        Collections.sort(uids);
        int nf = 3;

        // ---- D2: dynamic FBF sizes from average q-gram counts ---------------
        long[] gramSum = new long[nf];
        for (String uid : uids)
            for (int j = 0; j < nf; j++)
                gramSum[j] += qgramCount(fields.get(uid)[j]);
        int[] fbfSizes = new int[nf];
        for (int j = 0; j < nf; j++) {
            double g = (double) gramSum[j] / uids.size();
            fbfSizes[j] = (int) Math.ceil(1.0 / (1.0 - Math.pow(0.5, 1.0 / (g * K))));
        }

        // ---- D3: weighted RBF size + composition ----------------------------
        int rbfN = 0;
        for (int j = 0; j < nf; j++) rbfN = Math.max(rbfN, (int) (fbfSizes[j] / WEIGHTS[j]));
        // no remainder redistribution (RowBloomFilterEncoding.java:141-144):
        // slots beyond sum(comp) of the permutation stay 0
        int[] comp = new int[nf];
        for (int j = 0; j < nf; j++) comp[j] = (int) (WEIGHTS[j] * rbfN);

        // ---- D3 uniform: rbf_n = sum(fbfN); composition = ceil for field 0,
        // floor for the rest (RowBloomFilterEncoding.java:112-121); counts
        // may sum to LESS than rbf_n — leftover permutation slots stay 0
        int rbfNU = 0;
        for (int n : fbfSizes) rbfNU += n;
        int[] compU = new int[nf];
        double perU = rbfNU / (double) nf;
        for (int j = 0; j < nf; j++)
            compU[j] = j == 0 ? (int) Math.ceil(perU) : (int) Math.floor(perU);

        // selection streams + permutation (seeded Java PRNG — the
        // hash-parity-critical part this golden pins down)
        int[][] sel = new int[nf][];
        int[][] selU = new int[nf][];
        for (int j = 0; j < nf; j++) {
            Random rnd = new Random(SELECTION_SEEDS[j]);
            sel[j] = new int[comp[j]];
            for (int t = 0; t < comp[j]; t++) sel[j][t] = rnd.nextInt(fbfSizes[j]);
            Random rndU = new Random(SELECTION_SEEDS[j]);
            selU[j] = new int[compU[j]];
            for (int t = 0; t < compU[j]; t++) selU[j][t] = rndU.nextInt(fbfSizes[j]);
        }
        List<Integer> permList = new ArrayList<>(rbfN);
        for (int i = 0; i < rbfN; i++) permList.add(i);
        Collections.shuffle(permList, new Random(PERM_SEED));
        List<Integer> permListU = new ArrayList<>(rbfNU);
        for (int i = 0; i < rbfNU; i++) permListU.add(i);
        Collections.shuffle(permListU, new Random(PERM_SEED));

        // ---- encode every record: FBF concat + RBF sample/permute -----------
        try (PrintWriter wf = csv(dir, "pprl_encode_fbf.csv", "uid,bf_digest");
             PrintWriter wr = csv(dir, "pprl_encode_rbf.csv", "uid,bf_digest");
             PrintWriter ws = csv(dir, "pprl_encode_fbf_static.csv", "uid,bf_digest");
             PrintWriter wu = csv(dir, "pprl_encode_rbf_uniform.csv", "uid,bf_digest")) {
            int fbfTotal = 0;
            for (int n : fbfSizes) fbfTotal += n;
            for (String uid : uids) {
                boolean[][] fieldBits = new boolean[nf][];
                for (int j = 0; j < nf; j++)
                    fieldBits[j] = encodeField(fields.get(uid)[j], fbfSizes[j]);

                boolean[] fbf = new boolean[fbfTotal];
                int off = 0;
                for (int j = 0; j < nf; j++) {
                    for (int p = 0; p < fbfSizes[j]; p++) fbf[off + p] = fieldBits[j][p];
                    off += fbfSizes[j];
                }
                wf.println(uid + "," + sha256Hex(upperHex(pack(fbf))));

                boolean[] rbf = new boolean[rbfN];
                int t = 0;
                for (int j = 0; j < nf; j++)
                    for (int s : sel[j])
                        rbf[permList.get(t++)] = fieldBits[j][s];
                wr.println(uid + "," + sha256Hex(upperHex(pack(rbf))));

                // FBF-static: same kernels over fixed-size per-field filters
                boolean[] fbfS = new boolean[STATIC_N * nf];
                for (int j = 0; j < nf; j++) {
                    boolean[] fb = encodeField(fields.get(uid)[j], STATIC_N);
                    for (int p = 0; p < STATIC_N; p++) fbfS[j * STATIC_N + p] = fb[p];
                }
                ws.println(uid + "," + sha256Hex(upperHex(pack(fbfS))));

                // RBF-uniform: uniform draw counts over the SAME dynamic
                // per-field filters, rbf_n = sum(fbfN)
                boolean[] rbfU = new boolean[rbfNU];
                int tu = 0;
                for (int j = 0; j < nf; j++)
                    for (int s : selU[j])
                        rbfU[permListU.get(tu++)] = fieldBits[j][s];
                wu.println(uid + "," + sha256Hex(upperHex(pack(rbfU))));
            }
        }

        // plan echo: pytest asserts these equal the Python planner's output,
        // so a pow/ceil ulp divergence would fail loudly instead of as an
        // opaque digest mismatch
        try (PrintWriter w = new PrintWriter(
                Files.newBufferedWriter(dir.resolve("pprl_enc_plan.properties")))) {
            w.println("fbf_sizes=" + join(fbfSizes));
            w.println("rbf_n=" + rbfN);
            w.println("rbf_composition=" + join(comp));
            w.println("K=" + K);
            w.println("Q=" + Q);
            w.println("fbf_static_n=" + STATIC_N);
            w.println("rbf_uniform_n=" + rbfNU);
            w.println("rbf_uniform_composition=" + join(compU));
        }
        System.out.println("encoding goldens written to " + dir
                + " fbf_sizes=" + join(fbfSizes) + " rbf_n=" + rbfN
                + " rbf_uniform_n=" + rbfNU);
    }

    // --- kernels -------------------------------------------------------------

    static String proper(String text) {
        String p = text.replaceAll("\\s+", "_");
        if (!p.startsWith("_")) p = "_" + p;
        if (!p.endsWith("_")) p = p + "_";
        return p;
    }

    static long qgramCount(String text) {
        if (text.isEmpty()) return 0;
        return Math.max(proper(text).length() - Q + 1, 0);
    }

    static boolean[] encodeField(String text, int n) {
        boolean[] bits = new boolean[n];
        if (text.isEmpty()) return bits;
        String p = proper(text);
        Set<String> grams = new HashSet<>();
        for (int i = 0; i + Q <= p.length(); i++) grams.add(p.substring(i, i + Q));
        for (String g : grams)
            for (int pos : hashesV3(g, n))
                bits[pos] = true;
        return bits;
    }

    static int[] hashesV3(String gram, int n) {
        return HASH_CACHE.computeIfAbsent(n + "|" + gram, key -> {
            byte[] data = gram.getBytes(StandardCharsets.UTF_8);
            int s = new java.math.BigInteger(SHA1.doFinal(data)).intValue();
            int m = new java.math.BigInteger(MD5.doFinal(data)).intValue();
            int[] out = new int[K];
            for (int i = 0; i < K; i++) out[i] = Math.abs((s + (i + 1) * m) % n);
            return out;
        });
    }

    static byte[] pack(boolean[] bits) {
        byte[] out = new byte[(bits.length + 7) / 8];
        for (int p = 0; p < bits.length; p++)
            if (bits[p]) out[p >> 3] |= (byte) (1 << (p & 7)); // LSB-first
        return out;
    }

    static String join(int[] xs) {
        StringBuilder sb = new StringBuilder();
        for (int i = 0; i < xs.length; i++) {
            if (i > 0) sb.append(',');
            sb.append(xs[i]);
        }
        return sb.toString();
    }

    static String upperHex(byte[] bytes) {
        StringBuilder sb = new StringBuilder(bytes.length * 2);
        for (byte bb : bytes) sb.append(String.format("%02X", bb));
        return sb.toString();
    }

    static String sha256Hex(String s) throws Exception {
        byte[] d = MessageDigest.getInstance("SHA-256").digest(s.getBytes(StandardCharsets.UTF_8));
        StringBuilder sb = new StringBuilder(d.length * 2);
        for (byte bb : d) sb.append(String.format("%02x", bb));
        return sb.toString();
    }

    static PrintWriter csv(Path dir, String name, String header) throws IOException {
        PrintWriter w = new PrintWriter(Files.newBufferedWriter(dir.resolve(name)));
        w.println(header);
        return w;
    }
}
