/* libjpeg coefficient oracle (tests / parity tooling only).
 *
 * Dumps the QUANTIZED DCT coefficients libjpeg decodes from a JPEG
 * stream via jpeg_read_coefficients() — the checkable bit-exactness
 * oracle for the decoder's entropy stage on foreign streams (BASELINE
 * north star: decode "bit-exact with GPUJPEG's decoder on its own
 * streams"; GPUJPEG itself decodes exactly what libjpeg decodes at the
 * coefficient level, cf. gpujpeg_huffman_gpu_decoder.cu:286-316 vs
 * libjpeg jdhuff.c — both implement T.81 F.2.2 verbatim).
 *
 * Built on demand with `gcc -ljpeg` (see native/__init__.py
 * jpeg_oracle()); loaded through ctypes.  Not part of the decode path.
 */

#include <setjmp.h>
#include <stddef.h>
#include <stdio.h>   /* jpeglib.h needs FILE declared first */
#include <string.h>

#include <jpeglib.h>

struct gj_err_mgr {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
};

static void gj_error_exit(j_common_ptr cinfo)
{
    struct gj_err_mgr* e = (struct gj_err_mgr*)cinfo->err;
    longjmp(e->jb, 1);
}

/* Probe: component count and per-component TRUE block dims (libjpeg
 * width_in_blocks/height_in_blocks = ceil(subsampled size / 8), NOT
 * MCU-padded).  Returns 0 on success, -1 on decode error.  bw/bh must
 * hold >= 4 ints each. */
long gj_oracle_info(const unsigned char* data, long n, int* ncomp,
                    int* bw, int* bh)
{
    struct jpeg_decompress_struct cinfo;
    struct gj_err_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = gj_error_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, (unsigned long)n);
    jpeg_read_header(&cinfo, TRUE);
    jvirt_barray_ptr* coefs = jpeg_read_coefficients(&cinfo);
    if (coefs == NULL) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    *ncomp = cinfo.num_components;
    for (int c = 0; c < cinfo.num_components && c < 4; c++) {
        bw[c] = (int)cinfo.comp_info[c].width_in_blocks;
        bh[c] = (int)cinfo.comp_info[c].height_in_blocks;
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* Decode and copy each component's quantized coefficients into the
 * caller buffers outs[c] (int16, bh*bw*64 elements, raster block
 * order, NATURAL coefficient order — libjpeg blocks are natural-order,
 * jdhuff.c writes through jpeg_natural_order).  Also copies the
 * per-component quant tables (natural order) into qt[c] (64 u16) when
 * qt != NULL.  Returns 0 on success, -1 on error. */
long gj_oracle_coefs(const unsigned char* data, long n, short** outs,
                     unsigned short** qt)
{
    struct jpeg_decompress_struct cinfo;
    struct gj_err_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = gj_error_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, (unsigned long)n);
    jpeg_read_header(&cinfo, TRUE);
    jvirt_barray_ptr* coefs = jpeg_read_coefficients(&cinfo);
    if (coefs == NULL) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    for (int c = 0; c < cinfo.num_components; c++) {
        jpeg_component_info* comp = &cinfo.comp_info[c];
        int bw = (int)comp->width_in_blocks;
        int bh = (int)comp->height_in_blocks;
        for (int by = 0; by < bh; by++) {
            JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, coefs[c], (JDIMENSION)by, 1, FALSE);
            for (int bx = 0; bx < bw; bx++) {
                memcpy(outs[c] + ((size_t)by * bw + bx) * 64,
                       rows[0][bx], 64 * sizeof(short));
            }
        }
        if (qt != NULL && comp->quant_table != NULL) {
            for (int k = 0; k < 64; k++)
                qt[c][k] = comp->quant_table->quantval[k];
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

int gj_oracle_version(void) { return 1; }
